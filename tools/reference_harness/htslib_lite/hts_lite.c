/* htslib-lite implementation: BGZF (RFC1952 + BC subfield), BAM record
 * decoding and the BAI binning index, written from the public
 * specifications (SAMv1.pdf §4, §5.2) to run the reference Platypus
 * release on a box without network access.  See htslib/bgzf.h for why
 * this exists.  Read path is complete; the write path covers what
 * Platypus touches (none in practice for callVariants).
 */
#include <limits.h>
#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include <zlib.h>

#include "htslib/bgzf.h"
#include "htslib/hts.h"
#include "htslib/sam.h"

#define BGZF_MAX_BLOCK 0x10000

struct hFILE_opaque;            /* we keep a FILE* in fp directly */

typedef struct lite_state {
    FILE *f;
    uint8_t cbuf[BGZF_MAX_BLOCK + 1024];
    uint8_t ubuf[BGZF_MAX_BLOCK];
} lite_state;

/* The BGZF struct's fp/uncompressed_block/compressed_block fields hold
 * our state: fp -> FILE*, cache -> lite_state. */

static lite_state *ST(BGZF *fp) { return (lite_state *)fp->cache; }
static FILE *FP(BGZF *fp) { return (FILE *)fp->fp; }

BGZF *bgzf_open(const char *path, const char *mode)
{
    BGZF *fp = (BGZF *)calloc(1, sizeof(BGZF));
    lite_state *st = (lite_state *)calloc(1, sizeof(lite_state));
    if (!fp || !st) { free(fp); free(st); return NULL; }
    int wr = (mode && mode[0] == 'w');
    st->f = fopen(path, wr ? "wb" : "rb");
    if (!st->f) { free(fp); free(st); return NULL; }
    fp->fp = (hFILE *)st->f;
    fp->cache = st;
    fp->is_write = wr;
    fp->is_compressed = 1;
    fp->compress_level = wr ? 6 : 0;
    fp->uncompressed_block = st->ubuf;
    fp->compressed_block = st->cbuf;
    fp->block_length = 0;
    fp->block_offset = 0;
    fp->block_address = 0;
    return fp;
}

/* Inflate one BGZF block at the current file offset.  Returns the
 * uncompressed length (0 for EOF block / end of file), -1 on error. */
static int bgzf_read_block(BGZF *fp)
{
    lite_state *st = ST(fp);
    FILE *f = FP(fp);
    long start = ftell(f);
    uint8_t hdr[12];
    if (fread(hdr, 1, 12, f) != 12) {
        if (feof(f)) { fp->block_length = 0; return 0; }
        return -1;
    }
    if (hdr[0] != 0x1f || hdr[1] != 0x8b) return -1;
    int xlen = hdr[10] | (hdr[11] << 8);
    uint8_t extra[256];
    if (xlen > (int)sizeof(extra)) return -1;
    if (fread(extra, 1, xlen, f) != (size_t)xlen) return -1;
    int bsize = -1;
    for (int off = 0; off + 4 <= xlen;) {
        int slen = extra[off + 2] | (extra[off + 3] << 8);
        if (extra[off] == 'B' && extra[off + 1] == 'C' && slen == 2)
            bsize = (extra[off + 4] | (extra[off + 5] << 8)) + 1;
        off += 4 + slen;
    }
    if (bsize < 0) return -1;
    int cdata = bsize - 12 - xlen - 8;
    if (cdata < 0 || cdata > (int)sizeof(st->cbuf)) return -1;
    if (fread(st->cbuf, 1, cdata, f) != (size_t)cdata) return -1;
    uint8_t tail[8];
    if (fread(tail, 1, 8, f) != 8) return -1;
    uint32_t isize = tail[4] | (tail[5] << 8) | (tail[6] << 16) |
                     ((uint32_t)tail[7] << 24);
    if (isize > BGZF_MAX_BLOCK) return -1;

    z_stream zs;
    memset(&zs, 0, sizeof(zs));
    zs.next_in = st->cbuf;
    zs.avail_in = cdata;
    zs.next_out = st->ubuf;
    zs.avail_out = BGZF_MAX_BLOCK;
    if (inflateInit2(&zs, -15) != Z_OK) return -1;
    int r = inflate(&zs, Z_FINISH);
    inflateEnd(&zs);
    if (r != Z_STREAM_END || zs.total_out != isize) return -1;

    fp->block_address = start;
    fp->block_length = (int)isize;
    fp->block_offset = 0;
    return (int)isize;
}

ssize_t bgzf_read(BGZF *fp, void *data, size_t length)
{
    uint8_t *out = (uint8_t *)data;
    size_t done = 0;
    while (done < length) {
        int avail = fp->block_length - fp->block_offset;
        if (avail <= 0) {
            /* note the address of the block we're ABOUT to read */
            long here = ftell(FP(fp));
            int n = bgzf_read_block(fp);
            if (n < 0) return -1;
            if (n == 0) break;          /* true EOF (or the EOF block) */
            fp->block_address = here;
            avail = fp->block_length;
        }
        int take = (int)(length - done < (size_t)avail ? length - done
                                                       : (size_t)avail);
        memcpy(out + done, ST(fp)->ubuf + fp->block_offset, take);
        fp->block_offset += take;
        done += take;
    }
    return (ssize_t)done;
}

int64_t bgzf_seek(BGZF *fp, int64_t vpos, int whence)
{
    (void)whence;  /* SEEK_SET only, like htslib */
    int64_t caddr = vpos >> 16;
    int coff = (int)(vpos & 0xffff);
    if (fseek(FP(fp), (long)caddr, SEEK_SET) != 0) return -1;
    fp->block_length = 0;   /* force re-read */
    fp->block_offset = 0;
    fp->block_address = caddr;
    if (coff > 0) {
        if (bgzf_read_block(fp) <= 0) return -1;
        fp->block_address = caddr;
        if (coff > fp->block_length) return -1;
        fp->block_offset = coff;
    }
    return 0;
}

int64_t bgzf_tell_(BGZF *fp)
{
    return (fp->block_address << 16) | (fp->block_offset & 0xffff);
}

static int bgzf_write_block(BGZF *fp, const uint8_t *data, int len)
{
    uint8_t comp[BGZF_MAX_BLOCK + 1024];
    z_stream zs;
    memset(&zs, 0, sizeof(zs));
    if (deflateInit2(&zs, fp->compress_level, Z_DEFLATED, -15, 8,
                     Z_DEFAULT_STRATEGY) != Z_OK)
        return -1;
    zs.next_in = (uint8_t *)data;
    zs.avail_in = len;
    zs.next_out = comp;
    zs.avail_out = sizeof(comp);
    if (deflate(&zs, Z_FINISH) != Z_STREAM_END) { deflateEnd(&zs); return -1; }
    int clen = (int)zs.total_out;
    deflateEnd(&zs);
    uint32_t crc = crc32(0, data, len);
    int bsize = clen + 12 + 6 + 8;
    uint8_t hdr[18] = {0x1f, 0x8b, 8, 4, 0, 0, 0, 0, 0, 0xff,
                       6, 0, 'B', 'C', 2, 0,
                       (uint8_t)((bsize - 1) & 0xff),
                       (uint8_t)(((bsize - 1) >> 8) & 0xff)};
    uint8_t tail[8] = {(uint8_t)(crc & 0xff), (uint8_t)((crc >> 8) & 0xff),
                       (uint8_t)((crc >> 16) & 0xff), (uint8_t)((crc >> 24) & 0xff),
                       (uint8_t)(len & 0xff), (uint8_t)((len >> 8) & 0xff),
                       (uint8_t)((len >> 16) & 0xff), (uint8_t)((len >> 24) & 0xff)};
    FILE *f = FP(fp);
    if (fwrite(hdr, 1, 18, f) != 18 || fwrite(comp, 1, clen, f) != (size_t)clen
        || fwrite(tail, 1, 8, f) != 8)
        return -1;
    return 0;
}

ssize_t bgzf_write(BGZF *fp, const void *data, size_t length)
{
    const uint8_t *in = (const uint8_t *)data;
    size_t done = 0;
    lite_state *st = ST(fp);
    while (done < length) {
        int room = 0xff00 - fp->block_offset;
        int take = (int)(length - done < (size_t)room ? length - done
                                                      : (size_t)room);
        memcpy(st->ubuf + fp->block_offset, in + done, take);
        fp->block_offset += take;
        done += take;
        if (fp->block_offset >= 0xff00) {
            if (bgzf_write_block(fp, st->ubuf, fp->block_offset) < 0) return -1;
            fp->block_offset = 0;
        }
    }
    return (ssize_t)done;
}

int bgzf_flush(BGZF *fp)
{
    if (fp->is_write && fp->block_offset > 0) {
        if (bgzf_write_block(fp, ST(fp)->ubuf, fp->block_offset) < 0) return -1;
        fp->block_offset = 0;
    }
    return 0;
}

static const uint8_t BGZF_EOF[28] = {
    0x1f, 0x8b, 0x08, 0x04, 0, 0, 0, 0, 0, 0xff, 0x06, 0x00, 0x42, 0x43,
    0x02, 0x00, 0x1b, 0x00, 0x03, 0x00, 0, 0, 0, 0, 0, 0, 0, 0};

int bgzf_close(BGZF *fp)
{
    if (!fp) return 0;
    if (fp->is_write) {
        bgzf_flush(fp);
        fwrite(BGZF_EOF, 1, sizeof(BGZF_EOF), FP(fp));
    }
    fclose(FP(fp));
    free(fp->cache);
    free(fp);
    return 0;
}

/* ---------------------------------------------------------------- SAM/BAM */

samFile *sam_open(const char *fn, const char *mode)
{
    BGZF *bg = bgzf_open(fn, mode);
    if (!bg) return NULL;
    samFile *fp = (samFile *)calloc(1, sizeof(samFile));
    fp->is_bin = 1;
    fp->is_compressed = 1;
    fp->is_write = (mode && mode[0] == 'w');
    fp->fn = strdup(fn);
    fp->fp.bgzf = bg;
    return fp;
}

int sam_close(samFile *fp)
{
    if (!fp) return 0;
    bgzf_close(fp->fp.bgzf);
    free(fp->fn);
    free(fp->line.s);
    free(fp);
    return 0;
}

static int read_le32(BGZF *bg, int32_t *out)
{
    uint8_t b[4];
    if (bgzf_read(bg, b, 4) != 4) return -1;
    *out = (int32_t)(b[0] | (b[1] << 8) | (b[2] << 16) | ((uint32_t)b[3] << 24));
    return 0;
}

bam_hdr_t *bam_hdr_init(void) { return (bam_hdr_t *)calloc(1, sizeof(bam_hdr_t)); }

bam_hdr_t *sam_hdr_read(samFile *fp)
{
    BGZF *bg = fp->fp.bgzf;
    uint8_t magic[4];
    if (bgzf_read(bg, magic, 4) != 4 || memcmp(magic, "BAM\1", 4) != 0)
        return NULL;
    bam_hdr_t *h = bam_hdr_init();
    int32_t l_text, n_ref;
    if (read_le32(bg, &l_text) < 0) return NULL;
    h->l_text = (uint32_t)l_text;
    h->text = (char *)malloc(l_text + 1);
    if (bgzf_read(bg, h->text, l_text) != l_text) return NULL;
    h->text[l_text] = 0;
    if (read_le32(bg, &n_ref) < 0) return NULL;
    h->n_targets = n_ref;
    h->target_name = (char **)calloc(n_ref, sizeof(char *));
    h->target_len = (uint32_t *)calloc(n_ref, sizeof(uint32_t));
    for (int i = 0; i < n_ref; i++) {
        int32_t l_name, l_ref;
        if (read_le32(bg, &l_name) < 0) return NULL;
        h->target_name[i] = (char *)malloc(l_name);
        if (bgzf_read(bg, h->target_name[i], l_name) != l_name) return NULL;
        if (read_le32(bg, &l_ref) < 0) return NULL;
        h->target_len[i] = (uint32_t)l_ref;
    }
    return h;
}

void bam_hdr_destroy(bam_hdr_t *h)
{
    if (!h) return;
    for (int i = 0; i < h->n_targets; i++) free(h->target_name[i]);
    free(h->target_name);
    free(h->target_len);
    free(h->text);
    free(h);
}

int bam_name2id(bam_hdr_t *h, const char *ref)
{
    for (int i = 0; i < h->n_targets; i++)
        if (strcmp(h->target_name[i], ref) == 0) return i;
    /* py3 harness: the engine keeps chromosome names as bytes, so the
     * region strings it formats read "b'chr20'"; strip the repr wrapper
     * and retry. */
    size_t n = strlen(ref);
    if (n > 3 && ref[0] == 'b' && ref[1] == '\'' && ref[n - 1] == '\'') {
        for (int i = 0; i < h->n_targets; i++) {
            size_t tn = strlen(h->target_name[i]);
            if (tn == n - 3 && memcmp(h->target_name[i], ref + 2, tn) == 0)
                return i;
        }
    }
    return -1;
}

bam1_t *bam_init1(void) { return (bam1_t *)calloc(1, sizeof(bam1_t)); }

void bam_destroy1(bam1_t *b)
{
    if (!b) return;
    free(b->data);
    free(b);
}

/* One record from the current BGZF position (SAMv1 §4.2).
 * Returns block length on success, -1 at EOF, -2 on truncation. */
static int bam_read1_lite(BGZF *bg, bam1_t *b)
{
    int32_t block_len;
    if (read_le32(bg, &block_len) < 0) return -1;
    if (block_len < 32) return -2;
    uint8_t fixed[32];
    if (bgzf_read(bg, fixed, 32) != 32) return -2;
    int32_t rd32[8];
    memcpy(rd32, fixed, 32);
    b->core.tid = rd32[0];
    b->core.pos = rd32[1];
    uint32_t bmn = (uint32_t)rd32[2];
    b->core.l_qname = bmn & 0xff;
    b->core.qual = (bmn >> 8) & 0xff;
    b->core.bin = bmn >> 16;
    uint32_t fnc = (uint32_t)rd32[3];
    b->core.n_cigar = fnc & 0xffff;
    b->core.flag = fnc >> 16;
    b->core.l_qseq = rd32[4];
    b->core.mtid = rd32[5];
    b->core.mpos = rd32[6];
    b->core.isize = rd32[7];
    int l_data = block_len - 32;
    if (l_data < 0) return -2;
    if (b->m_data < l_data) {
        b->m_data = l_data;
        b->data = (uint8_t *)realloc(b->data, l_data ? l_data : 1);
    }
    b->l_data = l_data;
    if (l_data && bgzf_read(bg, b->data, l_data) != l_data) return -2;
    return block_len;
}

int sam_read1(samFile *fp, bam_hdr_t *h, bam1_t *b)
{
    (void)h;
    return bam_read1_lite(fp->fp.bgzf, b);
}

int32_t bam_endpos(const bam1_t *b)
{
    if ((b->core.flag & BAM_FUNMAP) || b->core.n_cigar == 0)
        return b->core.pos + 1;
    const uint32_t *cig = bam_get_cigar(b);
    int64_t len = 0;
    for (uint32_t k = 0; k < b->core.n_cigar; k++) {
        int op = bam_cigar_op(cig[k]);
        if (op == BAM_CMATCH || op == BAM_CDEL || op == BAM_CREF_SKIP ||
            op == BAM_CEQUAL || op == BAM_CDIFF)
            len += bam_cigar_oplen(cig[k]);
    }
    return b->core.pos + (len > 0 ? (int32_t)len : 1);
}

uint8_t *bam_aux_get(const bam1_t *b, const char tag[2])
{
    uint8_t *s = bam_get_aux(b);
    uint8_t *end = b->data + b->l_data;
    while (s + 3 <= end) {
        uint8_t t0 = s[0], t1 = s[1], type = s[2];
        uint8_t *val = s + 2;
        int sz;
        switch (type) {
        case 'A': case 'c': case 'C': sz = 1; break;
        case 's': case 'S': sz = 2; break;
        case 'i': case 'I': case 'f': sz = 4; break;
        case 'd': sz = 8; break;
        case 'Z': case 'H': {
            uint8_t *p = val + 1;
            while (p < end && *p) p++;
            sz = (int)(p - val - 1) + 1;
            break;
        }
        case 'B': {
            if (val + 5 >= end) return NULL;
            uint8_t sub = val[1];
            uint32_t n;
            memcpy(&n, val + 2, 4);
            int esz = (sub == 'c' || sub == 'C') ? 1
                      : (sub == 's' || sub == 'S') ? 2 : 4;
            sz = 5 + (int)(n * esz);
            break;
        }
        default: return NULL;
        }
        if (t0 == tag[0] && t1 == tag[1]) return val;
        s = val + 1 + sz;
    }
    return NULL;
}

/* ----------------------------------------------------------------- index */

typedef struct lite_chunk { uint64_t beg, end; } lite_chunk;

typedef struct lite_bin {
    uint32_t bin;
    int n_chunk;
    lite_chunk *chunks;
} lite_bin;

typedef struct lite_ref {
    int n_bin;
    lite_bin *bins;
    int n_intv;
    uint64_t *ioff;
} lite_ref;

struct hts_idx_t {
    int n_ref;
    lite_ref *refs;
};

static int fread_u32(FILE *f, uint32_t *v)
{
    uint8_t b[4];
    if (fread(b, 1, 4, f) != 4) return -1;
    *v = b[0] | (b[1] << 8) | (b[2] << 16) | ((uint32_t)b[3] << 24);
    return 0;
}

static int fread_u64(FILE *f, uint64_t *v)
{
    uint32_t lo, hi;
    if (fread_u32(f, &lo) < 0 || fread_u32(f, &hi) < 0) return -1;
    *v = ((uint64_t)hi << 32) | lo;
    return 0;
}

void hts_idx_destroy(hts_idx_t *idx)
{
    if (!idx) return;
    for (int r = 0; r < idx->n_ref; r++) {
        for (int b = 0; b < idx->refs[r].n_bin; b++)
            free(idx->refs[r].bins[b].chunks);
        free(idx->refs[r].bins);
        free(idx->refs[r].ioff);
    }
    free(idx->refs);
    free(idx);
}

hts_idx_t *sam_index_load(samFile *fp, const char *fn)
{
    (void)fp;
    char path[4096];
    snprintf(path, sizeof(path), "%s.bai", fn);
    FILE *f = fopen(path, "rb");
    if (!f) {
        /* fn may itself be the .bai */
        f = fopen(fn, "rb");
        if (!f) return NULL;
    }
    uint8_t magic[4];
    if (fread(magic, 1, 4, f) != 4 || memcmp(magic, "BAI\1", 4) != 0) {
        fclose(f);
        return NULL;
    }
    hts_idx_t *idx = (hts_idx_t *)calloc(1, sizeof(hts_idx_t));
    uint32_t n_ref;
    if (fread_u32(f, &n_ref) < 0) goto fail;
    idx->n_ref = (int)n_ref;
    idx->refs = (lite_ref *)calloc(n_ref ? n_ref : 1, sizeof(lite_ref));
    for (uint32_t r = 0; r < n_ref; r++) {
        uint32_t n_bin;
        if (fread_u32(f, &n_bin) < 0) goto fail;
        idx->refs[r].n_bin = (int)n_bin;
        idx->refs[r].bins = (lite_bin *)calloc(n_bin ? n_bin : 1,
                                               sizeof(lite_bin));
        for (uint32_t b = 0; b < n_bin; b++) {
            uint32_t bin, n_chunk;
            if (fread_u32(f, &bin) < 0 || fread_u32(f, &n_chunk) < 0) goto fail;
            lite_bin *lb = &idx->refs[r].bins[b];
            lb->bin = bin;
            lb->n_chunk = (int)n_chunk;
            lb->chunks = (lite_chunk *)calloc(n_chunk ? n_chunk : 1,
                                              sizeof(lite_chunk));
            for (uint32_t c = 0; c < n_chunk; c++)
                if (fread_u64(f, &lb->chunks[c].beg) < 0 ||
                    fread_u64(f, &lb->chunks[c].end) < 0)
                    goto fail;
        }
        uint32_t n_intv;
        if (fread_u32(f, &n_intv) < 0) goto fail;
        idx->refs[r].n_intv = (int)n_intv;
        idx->refs[r].ioff = (uint64_t *)calloc(n_intv ? n_intv : 1,
                                               sizeof(uint64_t));
        for (uint32_t i = 0; i < n_intv; i++)
            if (fread_u64(f, &idx->refs[r].ioff[i]) < 0) goto fail;
    }
    fclose(f);
    return idx;
fail:
    fclose(f);
    hts_idx_destroy(idx);
    return NULL;
}

struct hts_itr_t {
    int tid, beg, end;
    int n_chunk, cur_chunk;
    lite_chunk *chunks;
    uint64_t curr_off;
    int started, finished;
};

/* reg2bins (SAMv1 §5.3) */
static int reg2bins(int64_t beg, int64_t end, uint16_t *list)
{
    int i = 0, k;
    if (beg >= end) return 0;
    if (end >= 1LL << 29) end = 1LL << 29;
    --end;
    list[i++] = 0;
    for (k = 1 + (int)(beg >> 26); k <= 1 + (int)(end >> 26); ++k) list[i++] = (uint16_t)k;
    for (k = 9 + (int)(beg >> 23); k <= 9 + (int)(end >> 23); ++k) list[i++] = (uint16_t)k;
    for (k = 73 + (int)(beg >> 20); k <= 73 + (int)(end >> 20); ++k) list[i++] = (uint16_t)k;
    for (k = 585 + (int)(beg >> 17); k <= 585 + (int)(end >> 17); ++k) list[i++] = (uint16_t)k;
    for (k = 4681 + (int)(beg >> 14); k <= 4681 + (int)(end >> 14); ++k) list[i++] = (uint16_t)k;
    return i;
}

static int chunk_cmp(const void *a, const void *b)
{
    const lite_chunk *x = (const lite_chunk *)a, *y = (const lite_chunk *)b;
    if (x->beg < y->beg) return -1;
    if (x->beg > y->beg) return 1;
    return 0;
}

hts_itr_t *sam_itr_queryi(const hts_idx_t *idx, int tid, int beg, int end)
{
    hts_itr_t *it = (hts_itr_t *)calloc(1, sizeof(hts_itr_t));
    it->tid = tid;
    it->beg = beg < 0 ? 0 : beg;
    it->end = end;
    if (!idx || tid < 0 || tid >= idx->n_ref) { it->finished = 1; return it; }
    const lite_ref *ref = &idx->refs[tid];
    uint16_t bins[37450 / 512 + 64];
    int nb = reg2bins(it->beg, end, bins);
    uint64_t min_off = 0;
    int intv = it->beg >> 14;
    if (ref->n_intv > 0)
        min_off = ref->ioff[intv < ref->n_intv ? intv : ref->n_intv - 1];
    int cap = 16, n = 0;
    lite_chunk *cl = (lite_chunk *)malloc(cap * sizeof(lite_chunk));
    for (int i = 0; i < nb; i++) {
        for (int b = 0; b < ref->n_bin; b++) {
            if (ref->bins[b].bin != bins[i]) continue;
            for (int c = 0; c < ref->bins[b].n_chunk; c++) {
                lite_chunk ch = ref->bins[b].chunks[c];
                if (ch.end <= min_off) continue;
                if (ch.beg < min_off) ch.beg = min_off;
                if (n == cap) {
                    cap *= 2;
                    cl = (lite_chunk *)realloc(cl, cap * sizeof(lite_chunk));
                }
                cl[n++] = ch;
            }
        }
    }
    qsort(cl, n, sizeof(lite_chunk), chunk_cmp);
    /* merge adjacent/overlapping chunks */
    int m = 0;
    for (int i = 0; i < n; i++) {
        if (m > 0 && cl[i].beg <= cl[m - 1].end) {
            if (cl[i].end > cl[m - 1].end) cl[m - 1].end = cl[i].end;
        } else {
            cl[m++] = cl[i];
        }
    }
    it->n_chunk = m;
    it->chunks = cl;
    if (m == 0) it->finished = 1;
    return it;
}

hts_itr_t *sam_itr_querys(const hts_idx_t *idx, bam_hdr_t *hdr,
                          const char *region)
{
    int beg = 0, end = INT_MAX, tid = -1;
    const char *colon = strrchr(region, ':');
    if (colon) {
        char name[4096];
        size_t n = (size_t)(colon - region);
        if (n >= sizeof(name)) n = sizeof(name) - 1;
        memcpy(name, region, n);
        name[n] = 0;
        tid = bam_name2id(hdr, name);
        if (tid >= 0) {
            hts_parse_reg(region, &beg, &end);
        }
    }
    if (tid < 0) {
        tid = bam_name2id(hdr, region);
        beg = 0;
        end = INT_MAX;
    }
    return sam_itr_queryi(idx, tid, beg, end);
}

const char *hts_parse_reg(const char *s, int *beg, int *end)
{
    const char *colon = strrchr(s, ':');
    *beg = 0;
    *end = INT_MAX;
    if (!colon) return s + strlen(s);
    /* "beg-end", 1-based inclusive, commas tolerated */
    long b = 0, e = -1;
    const char *p = colon + 1;
    int seen_dash = 0;
    long *cur = &b;
    for (; *p; p++) {
        if (*p == ',') continue;
        if (*p == '-' && !seen_dash) { seen_dash = 1; e = 0; cur = &e; continue; }
        if (*p < '0' || *p > '9') break;
        *cur = *cur * 10 + (*p - '0');
    }
    *beg = b > 0 ? (int)(b - 1) : 0;
    *end = seen_dash ? (e > 0 ? (int)e : INT_MAX) : (b > 0 ? (int)b : INT_MAX);
    return colon;
}

void sam_itr_destroy(hts_itr_t *itr)
{
    if (!itr) return;
    free(itr->chunks);
    free(itr);
}

int sam_itr_next(samFile *htsfp, hts_itr_t *itr, bam1_t *r)
{
    if (!itr || itr->finished) return -1;
    BGZF *bg = htsfp->fp.bgzf;
    for (;;) {
        if (!itr->started) {
            if (itr->cur_chunk >= itr->n_chunk) { itr->finished = 1; return -1; }
            if (bgzf_seek(bg, (int64_t)itr->chunks[itr->cur_chunk].beg, 0) < 0)
                return -2;
            itr->curr_off = itr->chunks[itr->cur_chunk].beg;
            itr->started = 1;
        }
        if (itr->curr_off >= itr->chunks[itr->cur_chunk].end) {
            itr->cur_chunk++;
            if (itr->cur_chunk >= itr->n_chunk) { itr->finished = 1; return -1; }
            if (bgzf_seek(bg, (int64_t)itr->chunks[itr->cur_chunk].beg, 0) < 0)
                return -2;
            itr->curr_off = itr->chunks[itr->cur_chunk].beg;
        }
        int ret = bam_read1_lite(bg, r);
        if (ret < 0) { itr->finished = 1; return ret == -1 ? -1 : -2; }
        itr->curr_off = (uint64_t)bgzf_tell_(bg);
        if (r->core.tid != itr->tid || r->core.pos >= itr->end) {
            /* coordinate-sorted: nothing further can overlap */
            itr->finished = 1;
            return -1;
        }
        if (bam_endpos(r) > itr->beg) return ret;
        /* else: record ends before the window — keep scanning */
    }
}
