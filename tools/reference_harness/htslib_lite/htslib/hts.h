/* htslib-lite — see bgzf.h header comment. */
#ifndef HTSLIB_LITE_HTS_H
#define HTSLIB_LITE_HTS_H

#include <stddef.h>
#include <stdint.h>

#ifdef __cplusplus
extern "C" {
#endif

typedef struct kstring_t {
    size_t l, m;
    char *s;
} kstring_t;

/* BAI index: per-reference binning + linear index (SAMv1 spec §5.2). */
typedef struct hts_idx_t hts_idx_t;

/* Region iterator over one (tid, beg, end) with the index's chunk list. */
typedef struct hts_itr_t hts_itr_t;

void hts_idx_destroy(hts_idx_t *idx);
const char *hts_parse_reg(const char *s, int *beg, int *end);

#ifdef __cplusplus
}
#endif

#endif
