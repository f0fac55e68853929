/* htslib-lite — see bgzf.h header comment.  Field names and call
 * signatures follow htslib 1.3's public sam.h because the reference's
 * generated C (htslibWrapper.c) accesses them by name; the
 * implementation behind them is original (hts_lite.c). */
#ifndef HTSLIB_LITE_SAM_H
#define HTSLIB_LITE_SAM_H

#include <stdint.h>
#include "htslib/bgzf.h"
#include "htslib/hts.h"

#ifdef __cplusplus
extern "C" {
#endif

typedef struct bam_hdr_t {
    int32_t n_targets;
    int32_t ignore_sam_err;
    uint32_t l_text;
    uint32_t *target_len;
    int8_t *cigar_tab;
    char **target_name;
    char *text;
    void *sdict;
} bam_hdr_t;

typedef struct bam1_core_t {
    int32_t tid;
    int32_t pos;
    uint32_t bin;
    uint32_t qual;
    uint32_t l_qname;   /* includes the trailing NUL (htslib 1.3 layout) */
    uint32_t flag;
    uint32_t n_cigar;
    int32_t l_qseq;
    int32_t mtid;
    int32_t mpos;
    int32_t isize;
} bam1_core_t;

typedef struct bam1_t {
    bam1_core_t core;
    int l_data;
    int m_data;
    uint8_t *data;      /* qname | cigar | seq(4-bit) | qual | aux */
    uint64_t id;
} bam1_t;

typedef struct cram_fd_opaque cram_fd;

typedef union samFileUnion {
    BGZF *bgzf;
    cram_fd *cram;
    hFILE *hfile;
    void *voidp;
} samFileUnion;

typedef struct samFile {
    uint32_t is_bin;
    uint32_t is_write;
    uint32_t is_be;
    uint32_t is_cram;
    uint32_t is_compressed;
    uint32_t is_kstream;
    uint32_t dummy;
    int64_t lineno;
    kstring_t line;
    char *fn;
    char *fn_aux;
    samFileUnion fp;
} samFile;

#define BAM_FPAIRED        1
#define BAM_FPROPER_PAIR   2
#define BAM_FUNMAP         4
#define BAM_FMUNMAP        8
#define BAM_FREVERSE      16
#define BAM_FMREVERSE     32
#define BAM_FREAD1        64
#define BAM_FREAD2       128
#define BAM_FSECONDARY   256
#define BAM_FQCFAIL      512
#define BAM_FDUP        1024
#define BAM_FSUPPLEMENTARY 2048

#define BAM_CMATCH      0
#define BAM_CINS        1
#define BAM_CDEL        2
#define BAM_CREF_SKIP   3
#define BAM_CSOFT_CLIP  4
#define BAM_CHARD_CLIP  5
#define BAM_CPAD        6
#define BAM_CEQUAL      7
#define BAM_CDIFF       8

samFile *sam_open(const char *fn, const char *mode);
int sam_close(samFile *fp);
bam_hdr_t *sam_hdr_read(samFile *fp);
bam_hdr_t *bam_hdr_init(void);
void bam_hdr_destroy(bam_hdr_t *h);
int bam_name2id(bam_hdr_t *h, const char *ref);

bam1_t *bam_init1(void);
void bam_destroy1(bam1_t *b);
int sam_read1(samFile *fp, bam_hdr_t *h, bam1_t *b);
int32_t bam_endpos(const bam1_t *b);

hts_idx_t *sam_index_load(samFile *fp, const char *fn);
hts_itr_t *sam_itr_queryi(const hts_idx_t *idx, int tid, int beg, int end);
hts_itr_t *sam_itr_querys(const hts_idx_t *idx, bam_hdr_t *hdr,
                          const char *region);
int sam_itr_next(samFile *htsfp, hts_itr_t *itr, bam1_t *r);
void sam_itr_destroy(hts_itr_t *itr);

uint8_t *bam_aux_get(const bam1_t *b, const char tag[2]);

/* Accessor macros per the public layout above. */
#define bam_is_rev(b)   (((b)->core.flag & BAM_FREVERSE) != 0)
#define bam_is_mrev(b)  (((b)->core.flag & BAM_FMREVERSE) != 0)
#define bam_get_qname(b) ((char *)(b)->data)
#define bam_get_cigar(b) ((uint32_t *)((b)->data + (b)->core.l_qname))
#define bam_get_seq(b)  ((b)->data + ((b)->core.n_cigar << 2) + (b)->core.l_qname)
#define bam_get_qual(b) ((b)->data + ((b)->core.n_cigar << 2) + (b)->core.l_qname + (((b)->core.l_qseq + 1) >> 1))
#define bam_get_aux(b)  ((b)->data + ((b)->core.n_cigar << 2) + (b)->core.l_qname + (((b)->core.l_qseq + 1) >> 1) + (b)->core.l_qseq)
#define bam_seqi(s, i)  ((s)[(i) >> 1] >> ((~(i) & 1) << 2) & 0xf)
#define bam_cigar_op(c)    ((c) & 0xf)
#define bam_cigar_oplen(c) ((c) >> 4)
#define bam_aux2Z(s)    ((char *)((s) + 1))

#ifdef __cplusplus
}
#endif

#endif
