PYTHON ?= python

.PHONY: all native test bench goldens clean

all: native

native:
	$(MAKE) -C platypus_tpu/native

test: native
	$(PYTHON) -m pytest tests/ -q

bench: native
	$(PYTHON) bench.py

# Regenerate golden fixtures from the compiled reference kernels
# (requires $$REFERENCE_DIR, default /root/reference, and gcc).
goldens:
	$(PYTHON) tools/make_align_goldens.py
	$(PYTHON) tools/make_tandem_goldens.py
	$(PYTHON) tools/make_flank_goldens.py

clean:
	$(MAKE) -C platypus_tpu/native clean
	find . -name __pycache__ -type d -exec rm -rf {} +
