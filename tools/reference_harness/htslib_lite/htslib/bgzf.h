/* htslib-lite: the minimal htslib-1.3-compatible API surface needed to
 * build and RUN the reference release (Platypus_0.8.1) on this box, where
 * the real htslib cannot be fetched (no network).  Original implementation
 * written against the public BGZF/BAM/BAI specifications (SAMv1.pdf +
 * tabix paper); the struct field NAMES follow htslib's public headers
 * because the reference's generated C accesses them by name
 * (/root/reference/src/cython/htslibWrapper.pxd:54-186 declares exactly
 * this surface).  Only what Platypus uses is implemented.
 */
#ifndef HTSLIB_LITE_BGZF_H
#define HTSLIB_LITE_BGZF_H

#include <stdint.h>
#include <stdio.h>
#include <sys/types.h>

#ifdef __cplusplus
extern "C" {
#endif

#ifndef ZLIB_H
typedef struct z_stream_s z_stream;     /* zlib's tag; opaque here */
#endif
typedef struct hFILE_opaque hFILE;      /* backed by plain FILE* here */
typedef struct bgzf_mtaux_t_opaque bgzf_mtaux_t;
typedef struct bgzidx_t_opaque bgzidx_t;

typedef struct BGZF {
    int errcode;
    int is_write;
    int is_be;
    int compress_level;
    int is_compressed;
    int is_gzip;
    int cache_size;
    int block_length;
    int block_offset;
    int64_t block_address;
    int64_t uncompressed_address;
    void *uncompressed_block;
    void *compressed_block;
    void *cache;
    hFILE *fp;
    bgzf_mtaux_t *mt;
    bgzidx_t *idx;
    int idx_build_otf;
    z_stream *gz_stream;
} BGZF;

BGZF *bgzf_open(const char *path, const char *mode);
int bgzf_close(BGZF *fp);
ssize_t bgzf_read(BGZF *fp, void *data, size_t length);
ssize_t bgzf_write(BGZF *fp, const void *data, size_t length);
int64_t bgzf_seek(BGZF *fp, int64_t pos, int whence);
int64_t bgzf_tell_(BGZF *fp);
#define bgzf_tell(fp) bgzf_tell_(fp)
int bgzf_flush(BGZF *fp);

#ifdef __cplusplus
}
#endif

#endif
