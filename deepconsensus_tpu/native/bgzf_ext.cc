// Native IO fast path: BGZF inflate, BAM record scanning, CRC32C.
//
// The reference delegates BAM decoding to htslib (C, via pysam). This
// extension supplies the equivalent hot loops for this framework's own BAM
// layer (deepconsensus_tpu/io/bgzf.py, bam.py): multi-block BGZF inflation
// with zlib, a record scanner that extracts fixed BAM fields into columnar
// arrays in one pass, and CRC32C for TFRecord framing. Exposed through
// ctypes (build: deepconsensus_tpu/native/build.sh).

#include <cstdint>
#include <cstring>

#include <zlib.h>

extern "C" {

// Sums the ISIZE fields of all BGZF members; returns -1 on malformed input.
long long dc_bgzf_decompressed_size(const uint8_t* src, long long n) {
  long long off = 0;
  long long total = 0;
  while (off + 28 <= n) {
    if (src[off] != 0x1f || src[off + 1] != 0x8b) return -1;
    uint16_t xlen;
    std::memcpy(&xlen, src + off + 10, 2);
    long long extra = off + 12;
    long long bsize = -1;
    long long end = extra + xlen;
    while (extra + 4 <= end) {
      uint8_t si1 = src[extra], si2 = src[extra + 1];
      uint16_t slen;
      std::memcpy(&slen, src + extra + 2, 2);
      if (si1 == 66 && si2 == 67 && slen == 2) {
        uint16_t b;
        std::memcpy(&b, src + extra + 4, 2);
        bsize = (long long)b + 1;
      }
      extra += 4 + slen;
    }
    if (bsize < 0) return -1;
    uint32_t isize;
    std::memcpy(&isize, src + off + bsize - 4, 4);
    total += isize;
    off += bsize;
  }
  return total;
}

// Inflates all BGZF members of src into dst (caller sizes dst via
// dc_bgzf_decompressed_size). Returns bytes written, or -1 on error.
long long dc_bgzf_decompress(const uint8_t* src, long long n, uint8_t* dst,
                             long long cap) {
  long long off = 0;
  long long out = 0;
  while (off + 28 <= n) {
    uint16_t xlen;
    std::memcpy(&xlen, src + off + 10, 2);
    long long extra = off + 12;
    long long bsize = -1;
    long long end = extra + xlen;
    while (extra + 4 <= end) {
      uint8_t si1 = src[extra], si2 = src[extra + 1];
      uint16_t slen;
      std::memcpy(&slen, src + extra + 2, 2);
      if (si1 == 66 && si2 == 67 && slen == 2) {
        uint16_t b;
        std::memcpy(&b, src + extra + 4, 2);
        bsize = (long long)b + 1;
      }
      extra += 4 + slen;
    }
    if (bsize < 0) return -1;
    const uint8_t* cdata = src + off + 12 + xlen;
    long long clen = bsize - 12 - xlen - 8;
    uint32_t isize;
    std::memcpy(&isize, src + off + bsize - 4, 4);
    if (out + isize > cap) return -1;

    z_stream zs;
    std::memset(&zs, 0, sizeof(zs));
    if (inflateInit2(&zs, -15) != Z_OK) return -1;
    zs.next_in = const_cast<uint8_t*>(cdata);
    zs.avail_in = (uInt)clen;
    zs.next_out = dst + out;
    zs.avail_out = isize;
    int rc = inflate(&zs, Z_FINISH);
    inflateEnd(&zs);
    if (rc != Z_STREAM_END && !(rc == Z_OK && isize == 0) &&
        !(rc == Z_BUF_ERROR && isize == 0)) {
      return -1;
    }
    out += isize;
    off += bsize;
  }
  return out;
}

// Scans BAM records in a decompressed buffer starting at `start`.
// For each record writes: offset (of the record body), body size, ref_id,
// pos, flag, l_seq, mapq, l_read_name, n_cigar_op. Returns the number of
// records, or -1 on truncation.
long long dc_bam_scan(const uint8_t* buf, long long n, long long start,
                      long long max_records, long long* offsets,
                      int32_t* sizes, int32_t* ref_ids, int32_t* positions,
                      int32_t* flags, int32_t* l_seqs, int32_t* mapqs,
                      int32_t* name_lens, int32_t* n_cigars) {
  long long off = start;
  long long i = 0;
  while (off + 4 <= n && i < max_records) {
    int32_t block_size;
    std::memcpy(&block_size, buf + off, 4);
    if (block_size < 32 || off + 4 + block_size > n) {
      if (off + 4 + block_size > n) return -1;  // truncated
      return -1;
    }
    const uint8_t* r = buf + off + 4;
    std::memcpy(ref_ids + i, r, 4);
    std::memcpy(positions + i, r + 4, 4);
    name_lens[i] = r[8];
    mapqs[i] = r[9];
    uint16_t n_cigar_op, flag;
    std::memcpy(&n_cigar_op, r + 12, 2);
    std::memcpy(&flag, r + 14, 2);
    n_cigars[i] = n_cigar_op;
    flags[i] = flag;
    std::memcpy(l_seqs + i, r + 16, 4);
    offsets[i] = off + 4;
    sizes[i] = block_size;
    off += 4 + block_size;
    i++;
  }
  return i;
}

// CRC32C (Castagnoli), slicing-by-8, for TFRecord framing.
static uint32_t crc32c_table[8][256];
static bool crc32c_init_done = false;

static void crc32c_init() {
  const uint32_t poly = 0x82f63b78u;
  for (int i = 0; i < 256; i++) {
    uint32_t crc = i;
    for (int j = 0; j < 8; j++) crc = (crc >> 1) ^ ((crc & 1) ? poly : 0);
    crc32c_table[0][i] = crc;
  }
  for (int i = 0; i < 256; i++) {
    uint32_t crc = crc32c_table[0][i];
    for (int t = 1; t < 8; t++) {
      crc = (crc >> 8) ^ crc32c_table[0][crc & 0xff];
      crc32c_table[t][i] = crc;
    }
  }
  crc32c_init_done = true;
}

uint32_t dc_crc32c(const uint8_t* data, long long n, uint32_t crc) {
  if (!crc32c_init_done) crc32c_init();
  crc = ~crc;
  while (n >= 8) {
    crc ^= (uint32_t)data[0] | ((uint32_t)data[1] << 8) |
           ((uint32_t)data[2] << 16) | ((uint32_t)data[3] << 24);
    uint32_t hi = (uint32_t)data[4] | ((uint32_t)data[5] << 8) |
                  ((uint32_t)data[6] << 16) | ((uint32_t)data[7] << 24);
    crc = crc32c_table[7][crc & 0xff] ^ crc32c_table[6][(crc >> 8) & 0xff] ^
          crc32c_table[5][(crc >> 16) & 0xff] ^
          crc32c_table[4][(crc >> 24) & 0xff] ^
          crc32c_table[3][hi & 0xff] ^ crc32c_table[2][(hi >> 8) & 0xff] ^
          crc32c_table[1][(hi >> 16) & 0xff] ^
          crc32c_table[0][(hi >> 24) & 0xff];
    data += 8;
    n -= 8;
  }
  while (n-- > 0) {
    crc = (crc >> 8) ^ crc32c_table[0][(crc ^ *data++) & 0xff];
  }
  return ~crc;
}

// Deflates `data` into BGZF members written to dst; returns bytes written
// or -1 if dst is too small. Used by the BGZF writer hot path.
long long dc_bgzf_compress(const uint8_t* data, long long n, uint8_t* dst,
                           long long cap, int level) {
  const long long chunk = 0xff00;
  long long off = 0;
  long long out = 0;
  while (off < n || (n == 0 && off == 0)) {
    long long len = n - off < chunk ? n - off : chunk;
    uint8_t cbuf[0x10000 + 1024];
    z_stream zs;
    std::memset(&zs, 0, sizeof(zs));
    if (deflateInit2(&zs, level, Z_DEFLATED, -15, 8, Z_DEFAULT_STRATEGY) !=
        Z_OK)
      return -1;
    zs.next_in = const_cast<uint8_t*>(data + off);
    zs.avail_in = (uInt)len;
    zs.next_out = cbuf;
    zs.avail_out = sizeof(cbuf);
    int rc = deflate(&zs, Z_FINISH);
    long long clen = sizeof(cbuf) - zs.avail_out;
    deflateEnd(&zs);
    if (rc != Z_STREAM_END) return -1;
    long long bsize = clen + 26;
    if (out + bsize > cap) return -1;
    uint8_t* b = dst + out;
    const uint8_t header[12] = {0x1f, 0x8b, 0x08, 0x04, 0, 0,
                                0,    0,    0,    0xff, 6, 0};
    std::memcpy(b, header, 12);
    b[12] = 'B';
    b[13] = 'C';
    b[14] = 2;
    b[15] = 0;
    uint16_t bs16 = (uint16_t)(bsize - 1);
    std::memcpy(b + 16, &bs16, 2);
    std::memcpy(b + 18, cbuf, clen);
    uint32_t crc = crc32(0, data + off, (uInt)len);
    std::memcpy(b + 18 + clen, &crc, 4);
    uint32_t isize = (uint32_t)len;
    std::memcpy(b + 22 + clen, &isize, 4);
    out += bsize;
    off += len;
    if (n == 0) break;
  }
  return out;
}

}  // extern "C"
