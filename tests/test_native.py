"""Native C++ runtime parity tests: the ctypes library must reproduce the
pure-Python I/O plane exactly."""

import numpy as np
import pytest

from platypus_tpu.io.bam import BamFile
from platypus_tpu.io.readbuffer import QCOptions, _trim_good_reads, check_and_trim_reads
from platypus_tpu import native

S55 = "/root/reference/test/S55_test_realigned.bam"

pytestmark = pytest.mark.skipif(native.load() is None,
                                reason="native library not built")

FIELDS = ["seq", "qual", "rlen", "pos", "end", "mapq", "flag", "chrom_id",
          "mate_chrom_id", "mate_pos", "insert_size", "cigar_flat", "cigar_off"]


def test_native_fetch_matches_python_full_scan():
    with BamFile(S55) as bf:
        chrom, length = bf.references[0]
        py = bf.fetch(chrom, 0, length, use_native=False)
        nat = bf.fetch(chrom, 0, length, use_native=True)
    assert len(py) == len(nat) > 1000
    for f in FIELDS:
        assert np.array_equal(getattr(py, f), getattr(nat, f)), f


def test_native_fetch_matches_python_region():
    with BamFile(S55) as bf:
        chrom, _ = bf.references[0]
        full = bf.fetch(chrom, 0, bf.references[0][1], use_native=False)
        mid = int(np.median(full.pos))
        py = bf.fetch(chrom, mid, mid + 2500, use_native=False)
        nat = bf.fetch(chrom, mid, mid + 2500, use_native=True)
    assert len(py) == len(nat) > 0
    for f in FIELDS:
        assert np.array_equal(getattr(py, f), getattr(nat, f)), f


def test_native_trim_matches_python():
    with BamFile(S55) as bf:
        chrom, length = bf.references[0]
        a = bf.fetch(chrom, 0, length, use_native=False)
        b = bf.fetch(chrom, 0, length, use_native=False)
    opts = QCOptions()
    # Run the full QC cascade twice, forcing the trimming step through
    # each implementation, and compare the resulting quals.
    import platypus_tpu.native as nat_mod

    good_a, _ = check_and_trim_reads(a, opts)  # native path (if loaded)
    saved = nat_mod._lib
    try:
        nat_mod._lib = None
        nat_mod._load_attempted = True
        good_b, _ = check_and_trim_reads(b, opts)  # forced python path
    finally:
        nat_mod._lib = saved
        nat_mod._load_attempted = True
    assert np.array_equal(good_a, good_b)
    assert np.array_equal(a.qual, b.qual)


def test_native_kmer_segments_matches_numpy():
    from platypus_tpu.native import native_kmer_segments
    from platypus_tpu.ops.kmer import HaplotypeKmerIndex, candidate_segments

    if native_kmer_segments(b"ACGTACGTACGTACGTACGTACGTACGT",
                            np.zeros((1, 10), np.uint8),
                            np.array([10]), np.array([0]), 0) is None:
        import pytest

        pytest.skip("native library not built")
    rng = np.random.default_rng(42)
    bases = np.frombuffer(b"ACGT", np.uint8)
    for _ in range(60):
        hap_len = int(rng.integers(9, 900))
        hap = rng.choice(bases, size=hap_len).tobytes()
        R = int(rng.integers(1, 40))
        L = int(rng.integers(5, 130))
        seq = rng.choice(bases, size=(R, L)).astype(np.uint8)
        rl = rng.integers(min(4, L), L + 1, size=R).astype(np.int64)
        for r in range(R):
            if hap_len > rl[r] + 1 and rng.random() < 0.7:
                off = int(rng.integers(0, hap_len - rl[r]))
                frag = np.frombuffer(hap, np.uint8)[off:off + rl[r]].copy()
                if rl[r] > 0:
                    frag[int(rng.integers(0, rl[r]))] = rng.choice(bases)
                seq[r, :rl[r]] = frag
        if rng.random() < 0.25:
            seq[rng.random(size=seq.shape) < 0.05] = ord("N")
        hs = int(rng.integers(-100, 100))
        rs = rng.integers(hs - 40, hs + hap_len + 40, size=R).astype(np.int64)
        pr0, ps0 = candidate_segments(HaplotypeKmerIndex(hap), seq, rl, rs, hs)
        pr1, ps1 = native_kmer_segments(hap, seq, rl, rs, hs)
        assert np.array_equal(pr0, pr1)
        assert np.array_equal(ps0, ps1)


def test_native_kmer_window_matches_per_hap():
    """The whole-window voter (one native call for H haplotypes) emits
    exactly the concatenation of the per-hap calls."""
    from platypus_tpu.native import (native_kmer_segments,
                                     native_kmer_segments_window)

    if native_kmer_segments(b"ACGTACGTACGTACGTACGTACGTACGT",
                            np.zeros((1, 10), np.uint8),
                            np.array([10]), np.array([0]), 0) is None:
        import pytest

        pytest.skip("native library not built")
    rng = np.random.default_rng(7)
    bases = np.frombuffer(b"ACGT", np.uint8)
    for _ in range(25):
        H = int(rng.integers(1, 9))
        haps = [rng.choice(bases, size=int(rng.integers(30, 400))).tobytes()
                for _ in range(H)]
        starts = rng.integers(-50, 50, size=H).astype(np.int64)
        R = int(rng.integers(1, 30))
        L = int(rng.integers(8, 120))
        seq = rng.choice(bases, size=(R, L)).astype(np.uint8)
        rl = rng.integers(5, L + 1, size=R).astype(np.int64)
        rs = rng.integers(-60, 400, size=R).astype(np.int64)
        pr_w, ps_w, counts = native_kmer_segments_window(haps, starts, seq, rl, rs)
        assert counts.sum() == len(pr_w)
        off = 0
        for h in range(H):
            pr1, ps1 = native_kmer_segments(haps[h], seq, rl, rs, int(starts[h]))
            n = counts[h]
            assert n == len(pr1)
            assert np.array_equal(pr_w[off:off + n], pr1)
            assert np.array_equal(ps_w[off:off + n], ps1)
            off += n


def test_native_variant_supported_matches_python():
    """The C++ batched variant_supported_by_read walk agrees with the Python
    walk over random CIGARs (indels, soft clips, skips) x random variants,
    both exact and non-exact indel matching."""
    import pytest

    from platypus_tpu import native
    from platypus_tpu.candidates.variant import Variant
    from platypus_tpu.vcfout.records import variant_supported_by_read

    if native.load() is None:
        pytest.skip("native library not built")

    rng = np.random.default_rng(7)
    bases = np.frombuffer(b"ACGT", np.uint8)
    OPS = [0, 1, 2, 3, 4, 7, 8]  # M I D N S = X
    for trial in range(400):
        # One read with a random multi-op CIGAR.
        n_ops = int(rng.integers(1, 6))
        words = []
        read_len = 0
        for k in range(n_ops):
            op = int(rng.choice(OPS))
            length = int(rng.integers(1, 30))
            words.append((length << 4) | op)
            if op in (0, 1, 3, 4, 7, 8):
                read_len += length
        if read_len == 0:
            continue
        L = read_len + int(rng.integers(0, 8))
        seq = np.zeros((1, L), np.uint8)
        seq[0, :read_len] = rng.choice(bases, size=read_len)
        pos = int(rng.integers(0, 50))
        cigar_flat = np.array(words, np.uint32)
        cigar_off = np.array([0, len(words)], np.int64)
        cigar = np.stack([cigar_flat & 0xF, cigar_flat >> 4], axis=1).astype(np.int64)

        for _ in range(6):
            kind = rng.random()
            vpos = int(rng.integers(pos - 5, pos + read_len + 5))
            if kind < 0.4:  # SNP/MNP
                n = int(rng.integers(1, 4))
                removed = bytes(rng.choice(bases, size=n))
                added = bytes(rng.choice(bases, size=n))
            elif kind < 0.7:  # insertion
                removed = b""
                added = bytes(rng.choice(bases, size=int(rng.integers(1, 9))))
            else:  # deletion
                removed = bytes(rng.choice(bases, size=int(rng.integers(1, 9))))
                added = b""
            var = Variant("chr20", max(0, vpos), removed, added, 1, 1)
            exact = bool(rng.random() < 0.5)

            want = variant_supported_by_read(cigar, seq[0], read_len, pos, var, exact)
            got = native.native_variant_supported(
                cigar_flat, cigar_off, seq, np.array([read_len], np.int32),
                np.array([pos], np.int64), np.array([0], np.int64),
                np.array([0], np.int64), var.ref_pos, var.added,
                var.n_removed, exact)
            assert got is not None and bool(got[0]) == bool(want), (
                trial, words, pos, vpos, removed, added, exact)


def test_native_band_align_matches_scalar_oracle():
    """C++ (AVX2/scalar) banded kernel vs ops/align_core.band_align_single:
    random cases incl. Ns, short reads, segment offsets, mismatches."""
    import numpy as np
    from platypus_tpu import native
    from platypus_tpu.native import native_band_align_pairs
    from platypus_tpu.ops.align_core import band_align_single

    if native.load() is None:
        pytest.skip("native library not built")

    rng = np.random.default_rng(9)
    bases = np.frombuffer(b"ACGTN", np.uint8)
    N, L2max = 200, 120
    hap_mat = np.full((N, L2max + 40), ord("N"), np.uint8)
    go_mat = np.zeros((N, L2max + 40), np.uint8)
    seq_mat = np.zeros((N, L2max), np.uint8)
    qual_mat = np.zeros((N, L2max), np.uint8)
    ph = np.arange(N, dtype=np.int64)
    ps = np.zeros(N, np.int64)
    rl = np.zeros(N, np.int32)
    exp = np.zeros(N, np.int64)
    for k in range(N):
        n = int(rng.integers(10, L2max + 1))
        rl[k] = n
        hap = rng.choice(bases, size=n + 15, p=[.24, .24, .24, .24, .04]).astype(np.uint8)
        go = rng.integers(1, 79, size=n + 15).astype(np.uint8)
        off = int(rng.integers(0, 16))
        read = hap[off : off + n].copy()
        mut = rng.integers(0, n, size=int(rng.integers(0, 6)))
        read[mut] = rng.choice(bases[:4], size=len(mut))
        qual = rng.integers(1, 45, size=n).astype(np.uint8)
        seg = int(rng.integers(0, 20))
        hap_mat[k, seg : seg + n + 15] = hap
        go_mat[k, seg : seg + n + 15] = go
        ps[k] = seg
        seq_mat[k, :n] = read
        qual_mat[k, :n] = qual
        exp[k] = band_align_single(hap.tobytes(), read.tobytes(),
                                   qual.astype(np.int32), 3, 2, go.astype(np.int32))
    got = native_band_align_pairs(hap_mat, go_mat, seq_mat, qual_mat,
                                  ph, ph, ps, rl, 3, 2, 4)
    assert np.array_equal(got, exp)


def test_stale_library_symbol_fallback():
    """A loaded library that predates the newer entry points must make the
    Python wrappers return None (fall back) instead of raising."""
    from platypus_tpu import native as N

    class FakeLib:
        def __getattr__(self, name):  # no ptpu_asm_region / band_align
            raise AttributeError(name)

    assert N._setup_asm_region(FakeLib()) is False
    assert N._setup_align(FakeLib()) is False


def test_native_em_bitwise_matches_numpy_oracle():
    """native/src/em.cpp must reproduce the numpy EM to the LAST BIT
    (summation orders replicated: pairwise fast axis, sequential outer
    axis, sequential scatter-add).  Covers G beyond the 128-element
    pairwise block and multi-sample outer reductions."""
    import numpy as np

    from platypus_tpu import native
    from platypus_tpu.ops import likelihood as lk

    if native.load() is None:
        import pytest

        pytest.skip("native library not built")
    rng = np.random.default_rng(7)
    for trial in range(60):
        H = int(rng.integers(2, 30)) if trial % 2 else int(rng.integers(2, 5))
        h1, h2 = lk.genotype_index_pairs(H)
        I = int(rng.integers(1, 40))
        lik = np.maximum(1e-300, rng.random((I, len(h1))))
        lik[rng.random((I, len(h1))) < 0.3] = 1e-300
        n_reads = rng.integers(0, 50, I)
        a = lk.em_haplotype_frequencies(lik, h1, h2, H, n_reads,
                                        _allow_native=False)
        b = native.native_em(lik, h1, h2, H, n_reads, 100)
        assert b is not None
        assert np.array_equal(a[0].view(np.uint64), b[0].view(np.uint64))
        assert np.array_equal(a[1].view(np.uint64), b[1].view(np.uint64))
        assert a[2] == b[2]


def test_native_genotype_call_bitwise_matches_python_oracle():
    """native/src/genotype.cpp must reproduce the Python per-sample
    genotype-call oracle (vcfout/records.py) to the LAST BIT: the masked
    base[match].sum() uses numpy's pairwise order over the gathered
    subset, argmax keeps the first strict maximum, and the phased/GOF
    bookkeeping follows the oracle's branch structure.  Randomized over
    H (past the 128-element pairwise block via large H), n_vars, cohort
    sizes on both sides of the freq-weighted threshold (n_ind > 25)."""
    import numpy as np
    import pytest

    from platypus_tpu import native
    from platypus_tpu.ops.likelihood import genotype_index_pairs
    from platypus_tpu.vcfout import records

    if native.load() is None:
        pytest.skip("native library not built")

    rng = np.random.default_rng(42)
    for trial in range(120):
        H = int(rng.integers(1, 20)) if trial % 3 else int(rng.integers(14, 24))
        I = int(rng.integers(1, 6))
        n_vars = int(rng.integers(1, 5))
        n_ind = I if trial % 2 else 30
        h1, h2 = genotype_index_pairs(H)
        G = len(h1)
        lik = np.maximum(1e-300, rng.random((I, G)))
        freqs = rng.random(H)
        gof = rng.uniform(0, 50, (G, I))
        hap_is_ref = (rng.random(H) < 0.5).astype(np.int64)
        var_in_hap = rng.random((H, n_vars)) < 0.4
        call = records._FakeCall(lik, freqs, h1, h2, gof)
        i = int(rng.integers(0, I))
        variants = [None] * n_vars
        want = records._compute_genotype_call_and_likelihoods_py(
            call, i, variants, hap_is_ref, var_in_hap, n_ind)
        got = records._genotype_call_native(
            call, i, variants, hap_is_ref, var_in_hap, n_ind)
        assert got is not None
        assert want[0] == got[0] and want[1] == got[1]
        assert np.asarray(want[2]).tobytes() == np.asarray(got[2]).tobytes()
        assert np.asarray(want[3:]).tobytes() == np.asarray(got[3:]).tobytes()


def test_native_em_batch_bitwise_matches_single_entry():
    """ptpu_em_f64_batch (region-batched, threaded) must reproduce the
    verified single-window native EM bit-for-bit on every entry."""
    import numpy as np
    import pytest

    from platypus_tpu import native
    from platypus_tpu.ops import likelihood as lk

    if native.load() is None:
        pytest.skip("native library not built")
    rng = np.random.default_rng(11)
    entries = []
    for trial in range(40):
        H = int(rng.integers(2, 12))
        h1, h2 = lk.genotype_index_pairs(H)
        I = int(rng.integers(1, 6))
        lik = np.maximum(1e-300, rng.random((I, len(h1))))
        n_reads = rng.integers(0, 30, I)
        entries.append((lik, h1, h2, H, n_reads.astype(np.int64)))
    batch = native.native_em_batch(entries, n_threads=4)
    assert batch is not None
    for (lik, h1, h2, H, n_reads), got in zip(entries, batch):
        want = native.native_em(lik, h1, h2, H, n_reads, 100)
        assert np.array_equal(want[0].view(np.uint64),
                              got[0].view(np.uint64))
        assert np.array_equal(want[1].view(np.uint64),
                              got[1].view(np.uint64))
        assert want[2] == got[2]


def test_native_gl_batch_matches_reference_sequential_oracle():
    """ptpu_gl_batch must equal a pure-python replication of the
    reference's SEQUENTIAL per-read accumulation (cgenotype.pyx:131-189)
    bit-for-bit, including the rescale."""
    import math

    import numpy as np
    import pytest

    from platypus_tpu import native
    from platypus_tpu.ops import likelihood as lk

    if native.load() is None:
        pytest.skip("native library not built")
    LOG10E = 0.43429448190325182
    LOG_HALF = -0.69314718055994529
    rng = np.random.default_rng(13)
    entries = []
    metas = []
    I = 3
    for trial in range(25):
        H = int(rng.integers(1, 7))
        h1, h2 = lk.genotype_index_pairs(H)
        R = int(rng.integers(0, 40))
        ll = -50.0 * rng.random((H, R))
        # force near-equal pairs so every fast path is exercised
        if R and H > 1:
            ll[1, : R // 2] = ll[0, : R // 2] + rng.choice(
                [0.0, 5e-4, 2.0, 10.0], R // 2)
        bounds = np.sort(rng.integers(0, R + 1, I + 1)).astype(np.int64)
        bounds[0], bounds[-1] = 0, R
        n_good = rng.integers(0, 10, I).astype(np.int64)
        entries.append((np.ascontiguousarray(ll), bounds, n_good, h1, h2))
        metas.append((ll, bounds, n_good, h1, h2))
    batch = native.native_gl_batch(entries, n_threads=4)
    assert batch is not None
    for (ll, bounds, n_good, h1, h2), (gl, gof, lik) in zip(metas, batch):
        G = len(h1)
        for i in range(I):
            lo, hi = int(bounds[i]), int(bounds[i + 1])
            want_gl = np.empty(G)
            want_gof = np.empty(G)
            for g in range(G):
                a, b = int(h1[g]), int(h2[g])
                acc = 0.0
                gv = 0.0
                for r in range(lo, hi):
                    l1, l2 = float(ll[a, r]), float(ll[b, r])
                    gv += max(LOG10E * l1, LOG10E * l2)
                    if a == b:
                        acc += l1
                    elif abs(l1 - l2) >= 3.0:
                        acc += LOG_HALF + max(l1, l2)
                    elif abs(l1 - l2) <= 1e-3:
                        acc += l1
                    else:
                        acc += math.log(0.5 * (math.exp(l1) + math.exp(l2)))
                want_gl[g] = acc
                want_gof[g] = gv
            assert np.array_equal(want_gof, gof[i])
            if n_good[i] > 0:
                assert np.array_equal(want_gl, gl[i])
                mx = max(want_gl.max(), -1e7)
                want_lik = np.maximum(1e-300, np.array(
                    [math.exp(x - mx) for x in want_gl]))
                assert np.array_equal(want_lik, lik[i])
            else:
                assert np.array_equal(gl[i], np.zeros(G))
                assert np.array_equal(lik[i], np.ones(G))


def test_native_posteriors_batch_matches_sequential_oracle():
    """ptpu_posteriors_batch must equal a python replication of the
    reference's sequential posterior dots (cpopulation.pyx:459-594)."""
    import math

    import numpy as np
    import pytest

    from platypus_tpu import native
    from platypus_tpu.ops import likelihood as lk

    if native.load() is None:
        pytest.skip("native library not built")
    rng = np.random.default_rng(17)
    entries = []
    for trial in range(30):
        H = int(rng.integers(1, 8))
        h1, h2 = lk.genotype_index_pairs(H)
        G = len(h1)
        I = int(rng.integers(1, 5))
        lik = np.maximum(1e-300, rng.random((I, G)))
        freq = rng.random(H)
        rows = np.nonzero(rng.random(I) < 0.8)[0].astype(np.int64)
        V = int(rng.integers(1, 4))
        vih = (rng.random((V, H)) < 0.5).astype(np.uint8)
        entries.append((lik, freq, h1, h2, rows, vih))
    batch = native.native_posteriors_batch(entries, n_threads=4)
    assert batch is not None
    for (lik, freq, h1, h2, rows, vih), got in zip(entries, batch):
        G, H, V = len(h1), len(freq), vih.shape[0]
        factor = [2.0 if h1[g] != h2[g] else 1.0 for g in range(G)]
        w_var = [factor[g] * freq[h1[g]] * freq[h2[g]] for g in range(G)]
        log_pv = []
        for i in rows:
            pv = 0.0
            for g in range(G):
                pv += w_var[g] * lik[i, g]
            log_pv.append(math.log(pv) if pv > 0 else -708.0)
        for v in range(V):
            fp = np.where(vih[v].astype(bool), 0.0, freq)
            s = fp.sum()  # np pairwise == np_pairwise_sum in C
            if s > 0:
                fp = fp / s
            w_nv = [factor[g] * fp[h1[g]] * fp[h2[g]] for g in range(G)]
            slv = snv = 0.0
            for j, i in enumerate(rows):
                pn = 0.0
                for g in range(G):
                    pn += w_nv[g] * lik[i, g]
                slv += log_pv[j]
                snv += math.log(pn) if pn > 0 else -708.0
            assert got[v] == snv - slv


def test_native_loglik_batch_matches_numpy_oracle():
    """ptpu_loglik_batch must equal window_loglik_from_pair_scores
    bit-for-bit when fed the same precomputed mapq term (the scatter-min
    is integer and the conversion is pure mul/add/max)."""
    import numpy as np
    import pytest

    from platypus_tpu import native
    from platypus_tpu.ops.kmer import HASH_NUCS
    from platypus_tpu.ops.likelihood import MLTOT, scores_to_logliks

    if native.load() is None:
        pytest.skip("native library not built")
    rng = np.random.default_rng(23)
    entries = []
    oracles = []
    for trial in range(30):
        H = int(rng.integers(1, 6))
        R = int(rng.integers(1, 60))
        A = int(rng.integers(1, R + 1))
        rows = np.sort(rng.choice(R, A, replace=False)).astype(np.int64)
        # The engine only batches requests with pairs (n_pairs() > 0).
        P = int(rng.integers(1, 4 * A * H + 1))
        ps = rng.integers(0, 400, P).astype(np.int64)
        ph = rng.integers(0, H, P).astype(np.int64)
        pr = rng.integers(0, A, P).astype(np.int64)
        sub_len = rng.integers(4, 120, A).astype(np.int32)
        mapq = rng.integers(0, 61, A)
        with np.errstate(divide="ignore"):
            term = np.log(1.0 - np.exp(MLTOT * mapq.astype(np.float64)))
        entries.append((ps, ph, pr, sub_len, term, rows, H, R))
        # numpy oracle (the exact body of window_loglik_from_pair_scores)
        loglik = np.zeros((H, R), np.float64)
        scores = np.zeros((H, A), np.int64)
        if P:
            scores[:] = np.iinfo(np.int32).max
            short = sub_len < HASH_NUCS
            scores[:, short] = 0
            np.minimum.at(scores, (ph, pr), ps)
        sub = scores_to_logliks(scores, mapq[None, :])
        loglik[:, rows] = sub
        oracles.append(loglik)
    got = native.native_loglik_batch(entries, HASH_NUCS, MLTOT, n_threads=4)
    assert got is not None
    for want, out in zip(oracles, got):
        assert np.array_equal(want.view(np.uint64), out.view(np.uint64))
