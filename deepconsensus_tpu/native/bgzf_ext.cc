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
#include <thread>
#include <vector>

#include <zlib.h>

// Parses and validates one BGZF member header at src[off..n). On success
// writes xlen/bsize and returns true; bsize is guaranteed to satisfy
// off + bsize <= n and off + 12 + xlen + 8 <= off + bsize, so the CDATA
// length (bsize - 12 - xlen - 8) is non-negative and the ISIZE read at
// off + bsize - 4 stays in bounds. XLEN/BSIZE come from the file and are
// untrusted; every derived offset is checked against the buffer end.
static bool scan_bgzf_member(const uint8_t* src, long long n, long long off,
                             uint16_t* xlen_out, long long* bsize_out) {
  if (off + 28 > n) return false;
  if (src[off] != 0x1f || src[off + 1] != 0x8b) return false;
  uint16_t xlen;
  std::memcpy(&xlen, src + off + 10, 2);
  long long extra = off + 12;
  long long end = extra + xlen;
  if (end > n) return false;
  long long bsize = -1;
  while (extra + 4 <= end) {
    uint8_t si1 = src[extra], si2 = src[extra + 1];
    uint16_t slen;
    std::memcpy(&slen, src + extra + 2, 2);
    if (extra + 4 + slen > end) return false;
    if (si1 == 66 && si2 == 67 && slen == 2) {
      uint16_t b;
      std::memcpy(&b, src + extra + 4, 2);
      bsize = (long long)b + 1;
    }
    extra += 4 + slen;
  }
  if (bsize < 0) return false;
  if (off + bsize > n) return false;
  if (12 + (long long)xlen + 8 > bsize) return false;  // clen would be < 0
  *xlen_out = xlen;
  *bsize_out = bsize;
  return true;
}

extern "C" {

// Sums the ISIZE fields of all BGZF members; returns -1 on malformed input.
long long dc_bgzf_decompressed_size(const uint8_t* src, long long n) {
  long long off = 0;
  long long total = 0;
  while (off + 28 <= n) {
    uint16_t xlen;
    long long bsize;
    if (!scan_bgzf_member(src, n, off, &xlen, &bsize)) return -1;
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
    long long bsize;
    if (!scan_bgzf_member(src, n, off, &xlen, &bsize)) return -1;
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

// Full batch record parser. Given the scan output (offsets/sizes per
// record), decodes every record's variable-length fields into columnar
// caller-allocated buffers in one pass: read names, cigar words, 4-bit
// sequence -> ASCII, qualities, and the PacBio aux tags on the hot path
// (zm/pw/ip/sn/ec/np/rq). Tags outside that set stay in the record's tag
// blob for the Python fallback parser. Returns 0, or -1 on malformed input.
//
// Layouts (element offsets precomputed by the caller):
//   seq/qual/pw/ip buffers are indexed by seq_starts[i] (prefix sum of
//   l_seq); cigar_out by cigar_starts[i]; name_out by name_starts[i]
//   (names stored without the trailing NUL). sn_out has 4 floats per
//   record. `present` is a bitmask per record:
//     1=zm 2=pw 4=ip 8=sn 16=ec 32=np 64=rq; 0x8000 = a tag with one of
//     those names was seen but not extracted (unusual subtype/length), so
//     the caller must fall back to the blob parser for misses.
static uint16_t seq_pair_lut[256];
static bool seq_lut_done = false;

static void seq_lut_init() {
  static const char* nib = "=ACMGRSVTWYHKDBN";
  for (int b = 0; b < 256; b++) {
    seq_pair_lut[b] = (uint16_t)(uint8_t)nib[b >> 4] |
                      ((uint16_t)(uint8_t)nib[b & 0xF] << 8);
  }
  seq_lut_done = true;
}

struct ParseArgs {
  const uint8_t* buf;
  const long long* offsets;
  const int32_t* sizes;
  const long long* seq_starts;
  const long long* cigar_starts;
  const long long* name_starts;
  uint8_t* seq_out;
  uint8_t* qual_out;
  uint8_t* qual_missing;
  uint32_t* cigar_out;
  uint8_t* name_out;
  uint16_t* pw_out;
  int32_t* pw_len;
  uint16_t* ip_out;
  int32_t* ip_len;
  float* sn_out;
  int64_t* zm_out;
  float* ec_out;
  int32_t* np_out;
  float* rq_out;
  uint16_t* present;
};

static long long parse_records_range(const ParseArgs& a, long long lo,
                                     long long hi) {
  const uint8_t* buf = a.buf;
  const long long* offsets = a.offsets;
  const int32_t* sizes = a.sizes;
  const long long* seq_starts = a.seq_starts;
  const long long* cigar_starts = a.cigar_starts;
  const long long* name_starts = a.name_starts;
  uint8_t* seq_out = a.seq_out;
  uint8_t* qual_out = a.qual_out;
  uint8_t* qual_missing = a.qual_missing;
  uint32_t* cigar_out = a.cigar_out;
  uint8_t* name_out = a.name_out;
  uint16_t* pw_out = a.pw_out;
  int32_t* pw_len = a.pw_len;
  uint16_t* ip_out = a.ip_out;
  int32_t* ip_len = a.ip_len;
  float* sn_out = a.sn_out;
  int64_t* zm_out = a.zm_out;
  float* ec_out = a.ec_out;
  int32_t* np_out = a.np_out;
  float* rq_out = a.rq_out;
  uint16_t* present = a.present;
  for (long long i = lo; i < hi; i++) {
    const uint8_t* r = buf + offsets[i];
    const uint8_t* end = r + sizes[i];
    int l_read_name = r[8];
    uint16_t n_cigar;
    std::memcpy(&n_cigar, r + 12, 2);
    int32_t l_seq;
    std::memcpy(&l_seq, r + 16, 4);
    if (l_read_name < 1 || l_seq < 0) return -1;  // corrupt record
    const uint8_t* p = r + 32;
    if (p + l_read_name + 4LL * n_cigar + (l_seq + 1) / 2 + l_seq > end)
      return -1;
    std::memcpy(name_out + name_starts[i], p, l_read_name - 1);
    p += l_read_name;
    std::memcpy(cigar_out + cigar_starts[i], p, 4LL * n_cigar);
    p += 4LL * n_cigar;
    // 4-bit sequence -> ASCII, two bases per packed byte.
    uint8_t* s = seq_out + seq_starts[i];
    int32_t pairs = l_seq / 2;
    for (int32_t k = 0; k < pairs; k++) {
      uint16_t two = seq_pair_lut[p[k]];
      s[2 * k] = (uint8_t)two;
      s[2 * k + 1] = (uint8_t)(two >> 8);
    }
    if (l_seq & 1) s[l_seq - 1] = (uint8_t)seq_pair_lut[p[pairs]];
    p += (l_seq + 1) / 2;
    std::memcpy(qual_out + seq_starts[i], p, l_seq);
    qual_missing[i] = (l_seq > 0 && p[0] == 0xFF) ? 1 : 0;
    p += l_seq;

    // Aux tag walk; extract the fixed PacBio set, skip everything else.
    uint16_t mask = 0;
    pw_len[i] = 0;
    ip_len[i] = 0;
    while (p + 3 <= end) {
      uint16_t key = (uint16_t)p[0] | ((uint16_t)p[1] << 8);
      uint8_t typ = p[2];
      p += 3;
      long long ival = 0;
      double fval = 0;
      bool is_int = false, is_float = false;
      int scalar_size = 0;
      switch (typ) {
        case 'c': scalar_size = 1; is_int = true; ival = *(const int8_t*)p; break;
        case 'C': scalar_size = 1; is_int = true; ival = *p; break;
        case 's': { int16_t v; std::memcpy(&v, p, 2); ival = v; scalar_size = 2; is_int = true; break; }
        case 'S': { uint16_t v; std::memcpy(&v, p, 2); ival = v; scalar_size = 2; is_int = true; break; }
        case 'i': { int32_t v; std::memcpy(&v, p, 4); ival = v; scalar_size = 4; is_int = true; break; }
        case 'I': { uint32_t v; std::memcpy(&v, p, 4); ival = v; scalar_size = 4; is_int = true; break; }
        case 'f': { float v; std::memcpy(&v, p, 4); fval = v; scalar_size = 4; is_float = true; break; }
        case 'A': scalar_size = 1; break;
        case 'Z':
        case 'H': {
          const uint8_t* z = (const uint8_t*)std::memchr(p, 0, end - p);
          if (z == nullptr) return -1;
          p = z + 1;
          switch (key) {  // fast-name tag with a string type: not extracted
            case (uint16_t)'z' | ((uint16_t)'m' << 8):
            case (uint16_t)'p' | ((uint16_t)'w' << 8):
            case (uint16_t)'i' | ((uint16_t)'p' << 8):
            case (uint16_t)'s' | ((uint16_t)'n' << 8):
            case (uint16_t)'e' | ((uint16_t)'c' << 8):
            case (uint16_t)'n' | ((uint16_t)'p' << 8):
            case (uint16_t)'r' | ((uint16_t)'q' << 8):
              mask |= 0x8000;
          }
          continue;
        }
        case 'B': {
          if (p + 5 > end) return -1;
          uint8_t sub = p[0];
          int32_t count;
          std::memcpy(&count, p + 1, 4);
          int isz;
          switch (sub) {
            case 'c': case 'C': isz = 1; break;
            case 's': case 'S': isz = 2; break;
            case 'i': case 'I': case 'f': isz = 4; break;
            default: return -1;
          }
          const uint8_t* data = p + 5;
          if (data + (long long)count * isz > end) return -1;
          bool is_pw = key == ((uint16_t)'p' | ((uint16_t)'w' << 8));
          bool is_ip = key == ((uint16_t)'i' | ((uint16_t)'p' << 8));
          bool is_sn = key == ((uint16_t)'s' | ((uint16_t)'n' << 8));
          if ((is_pw || is_ip) && count <= l_seq &&
              (sub == 'C' || sub == 'S')) {
            uint16_t* out =
                is_pw ? pw_out + seq_starts[i] : ip_out + seq_starts[i];
            if (sub == 'C') {
              for (int32_t k = 0; k < count; k++) out[k] = data[k];
            } else {
              std::memcpy(out, data, 2LL * count);
            }
            if (is_pw) {
              pw_len[i] = count;
              mask |= 2;
            } else {
              ip_len[i] = count;
              mask |= 4;
            }
          } else if (is_sn && sub == 'f' && count == 4) {
            std::memcpy(sn_out + 4 * i, data, 16);
            mask |= 8;
          } else if (is_pw || is_ip || is_sn) {
            mask |= 0x8000;  // fast-name tag present but not extracted
          }
          p = data + (long long)count * isz;
          continue;
        }
        default:
          return -1;
      }
      if (p + scalar_size > end) return -1;
      {
        const uint16_t kzm = (uint16_t)'z' | ((uint16_t)'m' << 8);
        const uint16_t knp = (uint16_t)'n' | ((uint16_t)'p' << 8);
        const uint16_t kec = (uint16_t)'e' | ((uint16_t)'c' << 8);
        const uint16_t krq = (uint16_t)'r' | ((uint16_t)'q' << 8);
        if (is_int && key == kzm) {
          zm_out[i] = ival;
          mask |= 1;
        } else if (is_int && key == knp) {
          np_out[i] = (int32_t)ival;
          mask |= 32;
        } else if (is_float && key == kec) {
          ec_out[i] = (float)fval;
          mask |= 16;
        } else if (is_float && key == krq) {
          rq_out[i] = (float)fval;
          mask |= 64;
        } else if (key == kzm || key == knp || key == kec || key == krq) {
          mask |= 0x8000;  // unexpected scalar type for a fast-name tag
        }
      }
      p += scalar_size;
    }
    present[i] = mask;
  }
  return 0;
}

long long dc_bam_parse_batch(
    const uint8_t* buf, long long n_records, const long long* offsets,
    const int32_t* sizes, const long long* seq_starts,
    const long long* cigar_starts, const long long* name_starts,
    uint8_t* seq_out, uint8_t* qual_out, uint8_t* qual_missing,
    uint32_t* cigar_out, uint8_t* name_out, uint16_t* pw_out,
    int32_t* pw_len, uint16_t* ip_out, int32_t* ip_len, float* sn_out,
    int64_t* zm_out, float* ec_out, int32_t* np_out, float* rq_out,
    uint16_t* present) {
  if (!seq_lut_done) seq_lut_init();
  ParseArgs a = {buf,      offsets, sizes,  seq_starts, cigar_starts,
                 name_starts, seq_out, qual_out, qual_missing, cigar_out,
                 name_out, pw_out,  pw_len, ip_out,     ip_len,
                 sn_out,   zm_out,  ec_out, np_out,     rq_out,
                 present};
  return parse_records_range(a, 0, n_records);
}

// Threaded variant: records are independent and all output regions are
// disjoint (columnar layouts are per-record), so a static partition of the
// record range is race-free.
long long dc_bam_parse_batch_mt(
    const uint8_t* buf, long long n_records, const long long* offsets,
    const int32_t* sizes, const long long* seq_starts,
    const long long* cigar_starts, const long long* name_starts,
    uint8_t* seq_out, uint8_t* qual_out, uint8_t* qual_missing,
    uint32_t* cigar_out, uint8_t* name_out, uint16_t* pw_out,
    int32_t* pw_len, uint16_t* ip_out, int32_t* ip_len, float* sn_out,
    int64_t* zm_out, float* ec_out, int32_t* np_out, float* rq_out,
    uint16_t* present, int n_threads) {
  if (!seq_lut_done) seq_lut_init();
  ParseArgs a = {buf,      offsets, sizes,  seq_starts, cigar_starts,
                 name_starts, seq_out, qual_out, qual_missing, cigar_out,
                 name_out, pw_out,  pw_len, ip_out,     ip_len,
                 sn_out,   zm_out,  ec_out, np_out,     rq_out,
                 present};
  if (n_threads <= 1 || n_records < 256) {
    return parse_records_range(a, 0, n_records);
  }
  // Partition by record count; records are similar-sized within a shard.
  std::vector<std::thread> threads;
  std::vector<long long> rcs(n_threads, 0);
  long long chunk = (n_records + n_threads - 1) / n_threads;
  for (int t = 0; t < n_threads; t++) {
    long long lo = t * chunk;
    long long hi = lo + chunk < n_records ? lo + chunk : n_records;
    if (lo >= hi) break;
    threads.emplace_back(
        [&a, &rcs, t, lo, hi] { rcs[t] = parse_records_range(a, lo, hi); });
  }
  for (auto& th : threads) th.join();
  for (int t = 0; t < n_threads; t++) {
    if (rcs[t] != 0) return -1;
  }
  return 0;
}

// Threaded BGZF inflate: one serial header scan indexes all members, then
// threads inflate disjoint members into their precomputed output offsets.
long long dc_bgzf_decompress_mt(const uint8_t* src, long long n, uint8_t* dst,
                                long long cap, int n_threads) {
  struct Member {
    long long src_off, dst_off, bsize;
    uint32_t isize;
  };
  std::vector<Member> members;
  long long off = 0, out = 0;
  while (off + 28 <= n) {
    uint16_t xlen;
    long long bsize;
    if (!scan_bgzf_member(src, n, off, &xlen, &bsize)) return -1;
    uint32_t isize;
    std::memcpy(&isize, src + off + bsize - 4, 4);
    if (out + isize > cap) return -1;
    members.push_back({off, out, bsize, isize});
    out += isize;
    off += bsize;
  }
  auto inflate_range = [&](size_t lo, size_t hi) -> long long {
    for (size_t i = lo; i < hi; i++) {
      const Member& m = members[i];
      uint16_t xlen;
      std::memcpy(&xlen, src + m.src_off + 10, 2);
      const uint8_t* cdata = src + m.src_off + 12 + xlen;
      long long clen = m.bsize - 12 - xlen - 8;
      z_stream zs;
      std::memset(&zs, 0, sizeof(zs));
      if (inflateInit2(&zs, -15) != Z_OK) return -1;
      zs.next_in = const_cast<uint8_t*>(cdata);
      zs.avail_in = (uInt)clen;
      zs.next_out = dst + m.dst_off;
      zs.avail_out = m.isize;
      int rc = inflate(&zs, Z_FINISH);
      inflateEnd(&zs);
      if (rc != Z_STREAM_END && !(rc == Z_OK && m.isize == 0) &&
          !(rc == Z_BUF_ERROR && m.isize == 0)) {
        return -1;
      }
    }
    return 0;
  };
  if (n_threads <= 1 || members.size() < 8) {
    if (inflate_range(0, members.size()) != 0) return -1;
    return out;
  }
  std::vector<std::thread> threads;
  std::vector<long long> rcs(n_threads, 0);
  size_t chunk = (members.size() + n_threads - 1) / n_threads;
  for (int t = 0; t < n_threads; t++) {
    size_t lo = (size_t)t * chunk;
    size_t hi = lo + chunk < members.size() ? lo + chunk : members.size();
    if (lo >= hi) break;
    threads.emplace_back(
        [&, t, lo, hi] { rcs[t] = inflate_range(lo, hi); });
  }
  for (auto& th : threads) th.join();
  for (int t = 0; t < n_threads; t++) {
    if (rcs[t] != 0) return -1;
  }
  return out;
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

// ---------------------------------------------------------------------------
// TFRecord tf.train.Example batch parser (the input-pipeline fast path).
//
// Parses an inflated TFRecord stream (u64 len + crc + payload + crc framing,
// see io/tfrecord.py) of tf.train.Example protos with the deepconsensus
// schema and copies 'subreads/encoded' / 'label/encoded' float32 blobs
// straight into caller-preallocated batch arrays — no per-example Python,
// no intermediate copies. Proto wire-format is walked by hand; unknown
// fields/keys are skipped, so schema additions stay compatible. Any
// malformed record aborts with -1 and the caller falls back to the checked
// Python parser.
// ---------------------------------------------------------------------------

static inline bool tfx_varint(const uint8_t*& p, const uint8_t* end,
                              uint64_t& v) {
  v = 0;
  int shift = 0;
  while (p < end && shift < 64) {
    uint8_t b = *p++;
    v |= (uint64_t)(b & 0x7f) << shift;
    if (!(b & 0x80)) return true;
    shift += 7;
  }
  return false;
}

static inline bool tfx_skip(const uint8_t*& p, const uint8_t* end,
                            uint64_t wiretype) {
  uint64_t v;
  switch (wiretype) {
    case 0:
      return tfx_varint(p, end, v);
    case 1:
      if (end - p < 8) return false;
      p += 8;
      return true;
    case 2:
      if (!tfx_varint(p, end, v) || (uint64_t)(end - p) < v) return false;
      p += v;
      return true;
    case 5:
      if (end - p < 4) return false;
      p += 4;
      return true;
    default:
      return false;
  }
}

// Extracts the first bytes value of a Feature{bytes_list} message.
static bool tfx_feature_bytes(const uint8_t* p, const uint8_t* end,
                              const uint8_t** out, uint64_t* out_len) {
  while (p < end) {
    uint64_t tag;
    if (!tfx_varint(p, end, tag)) return false;
    if ((tag >> 3) == 1 && (tag & 7) == 2) {  // bytes_list
      uint64_t blen;
      if (!tfx_varint(p, end, blen) || (uint64_t)(end - p) < blen)
        return false;
      const uint8_t* bend = p + blen;
      while (p < bend) {
        uint64_t t2;
        if (!tfx_varint(p, bend, t2)) return false;
        if ((t2 >> 3) == 1 && (t2 & 7) == 2) {  // value
          uint64_t vlen;
          if (!tfx_varint(p, bend, vlen) || (uint64_t)(bend - p) < vlen)
            return false;
          *out = p;
          *out_len = vlen;
          return true;
        }
        if (!tfx_skip(p, bend, t2 & 7)) return false;
      }
      return false;
    }
    if (!tfx_skip(p, end, tag & 7)) return false;
  }
  return false;
}

// Extracts the first int64 of a Feature{int64_list} (packed or not).
static bool tfx_feature_int64(const uint8_t* p, const uint8_t* end,
                              int64_t* out) {
  while (p < end) {
    uint64_t tag;
    if (!tfx_varint(p, end, tag)) return false;
    if ((tag >> 3) == 3 && (tag & 7) == 2) {  // int64_list
      uint64_t llen;
      if (!tfx_varint(p, end, llen) || (uint64_t)(end - p) < llen)
        return false;
      const uint8_t* lend = p + llen;
      while (p < lend) {
        uint64_t t2;
        if (!tfx_varint(p, lend, t2)) return false;
        uint64_t v;
        if ((t2 >> 3) == 1 && (t2 & 7) == 0) {  // unpacked value
          if (!tfx_varint(p, lend, v)) return false;
          *out = (int64_t)v;
          return true;
        }
        if ((t2 >> 3) == 1 && (t2 & 7) == 2) {  // packed values
          uint64_t plen;
          if (!tfx_varint(p, lend, plen) || (uint64_t)(lend - p) < plen)
            return false;
          const uint8_t* pend2 = p + plen;
          if (!tfx_varint(p, pend2, v)) return false;
          *out = (int64_t)v;
          return true;
        }
        if (!tfx_skip(p, lend, t2 & 7)) return false;
      }
      return false;
    }
    if (!tfx_skip(p, end, tag & 7)) return false;
  }
  return false;
}

struct TfxOut {
  long long sub_bytes;   // required byte length of subreads/encoded
  long long lab_bytes;   // 0 = inference (labels not required/copied)
  uint8_t* sub;
  uint8_t* lab;
  int32_t* npass;
};

static bool tfx_parse_example(const uint8_t* p, const uint8_t* end,
                              long long i, const TfxOut& o) {
  bool got_sub = false;
  bool got_lab = (o.lab_bytes == 0);
  while (p < end) {
    uint64_t tag;
    if (!tfx_varint(p, end, tag)) return false;
    if ((tag >> 3) == 1 && (tag & 7) == 2) {  // Example.features
      uint64_t flen;
      if (!tfx_varint(p, end, flen) || (uint64_t)(end - p) < flen)
        return false;
      const uint8_t* fend = p + flen;
      while (p < fend) {
        uint64_t t2;
        if (!tfx_varint(p, fend, t2)) return false;
        if ((t2 >> 3) == 1 && (t2 & 7) == 2) {  // Features.feature entry
          uint64_t elen;
          if (!tfx_varint(p, fend, elen) || (uint64_t)(fend - p) < elen)
            return false;
          const uint8_t* eend = p + elen;
          const uint8_t* key = nullptr;
          uint64_t key_len = 0;
          const uint8_t* val = nullptr;
          uint64_t val_len = 0;
          const uint8_t* q = p;
          while (q < eend) {
            uint64_t t3;
            if (!tfx_varint(q, eend, t3)) return false;
            if ((t3 & 7) == 2) {
              uint64_t l3;
              if (!tfx_varint(q, eend, l3) || (uint64_t)(eend - q) < l3)
                return false;
              if ((t3 >> 3) == 1) {
                key = q;
                key_len = l3;
              } else if ((t3 >> 3) == 2) {
                val = q;
                val_len = l3;
              }
              q += l3;
            } else if (!tfx_skip(q, eend, t3 & 7)) {
              return false;
            }
          }
          if (key && val) {
            const uint8_t* b;
            uint64_t blen;
            if (key_len == 16 && !memcmp(key, "subreads/encoded", 16)) {
              if (!tfx_feature_bytes(val, val + val_len, &b, &blen) ||
                  (long long)blen != o.sub_bytes)
                return false;
              memcpy(o.sub + i * o.sub_bytes, b, blen);
              got_sub = true;
            } else if (o.lab_bytes &&
                       key_len == 13 && !memcmp(key, "label/encoded", 13)) {
              if (!tfx_feature_bytes(val, val + val_len, &b, &blen) ||
                  (long long)blen != o.lab_bytes)
                return false;
              memcpy(o.lab + i * o.lab_bytes, b, blen);
              got_lab = true;
            } else if (o.npass && key_len == 19 &&
                       !memcmp(key, "subreads/num_passes", 19)) {
              int64_t v;
              if (tfx_feature_int64(val, val + val_len, &v))
                o.npass[i] = (int32_t)v;
            }
          }
          p = eend;
        } else if (!tfx_skip(p, fend, t2 & 7)) {
          return false;
        }
      }
    } else if (!tfx_skip(p, end, tag & 7)) {
      return false;
    }
  }
  return got_sub && got_lab;
}

// Walks the TFRecord framing; fills offsets/lengths up to cap. Returns the
// record count (which may exceed cap — call again with more room), or -1
// on malformed framing.
static long long tfx_scan(const uint8_t* buf, long long n, long long* offs,
                          long long* lens, long long cap) {
  long long p = 0;
  long long count = 0;
  while (p < n) {
    if (n - p < 12) return -1;
    uint64_t len;
    memcpy(&len, buf + p, 8);
    if ((uint64_t)(n - p - 16) < len) return -1;
    if (count < cap) {
      offs[count] = p + 12;
      lens[count] = (long long)len;
    }
    count++;
    p += 12 + (long long)len + 4;
  }
  return count;
}

extern "C" {

long long dc_tfrecord_count(const uint8_t* buf, long long n) {
  return tfx_scan(buf, n, nullptr, nullptr, 0);
}

// Parses every example in an inflated TFRecord stream into the output
// batch arrays. lab_bytes==0 skips labels (inference datasets). Returns
// the record count, or -1 on any malformed record (caller falls back to
// the Python parser).
long long dc_tfexample_parse_batch(const uint8_t* buf, long long n,
                                   long long sub_bytes, long long lab_bytes,
                                   uint8_t* out_sub, uint8_t* out_lab,
                                   int32_t* out_npass, long long cap,
                                   int n_threads) {
  std::vector<long long> offs(cap), lens(cap);
  long long cnt = tfx_scan(buf, n, offs.data(), lens.data(), cap);
  if (cnt < 0 || cnt > cap) return -1;
  TfxOut o = {sub_bytes, lab_bytes, out_sub, out_lab, out_npass};
  if (n_threads <= 1 || cnt < 64) {
    for (long long i = 0; i < cnt; i++) {
      if (!tfx_parse_example(buf + offs[i], buf + offs[i] + lens[i], i, o))
        return -1;
    }
    return cnt;
  }
  std::vector<std::thread> threads;
  std::vector<char> oks(n_threads, 1);
  long long chunk = (cnt + n_threads - 1) / n_threads;
  for (int t = 0; t < n_threads; t++) {
    long long lo = t * chunk;
    long long hi = lo + chunk < cnt ? lo + chunk : cnt;
    if (lo >= hi) break;
    threads.emplace_back([&, t, lo, hi] {
      for (long long i = lo; i < hi; i++) {
        if (!tfx_parse_example(buf + offs[i], buf + offs[i] + lens[i], i,
                               o)) {
          oks[t] = 0;
          return;
        }
      }
    });
  }
  for (auto& th : threads) th.join();
  for (int t = 0; t < n_threads; t++) {
    if (!oks[t]) return -1;
  }
  return cnt;
}

}  // extern "C"

// ---------------------------------------------------------------------------
// Featurizer fast path: spacing geometry + window scatter.
//
// Native mirror of deepconsensus_tpu/preprocess/spacing.spaced_columns and
// the subread scatter loop in windows.zmw_window_block, for the inference
// path (no label reads). Pure integer arithmetic — results are bit-equal to
// the numpy implementations (equivalence-tested from Python).

extern "C" {

// Spaced output column per read position (inference reads: no labels).
// cig: concatenated per-position cigar ops; offs[n_reads+1] read bounds.
// Writes col[total] (int32) and finals[n_reads]; returns 0, or -1 on
// malformed input.
long long dc_spaced_columns(const uint8_t* cig, const long long* offs,
                            long long n_reads, int32_t* col,
                            long long* finals) {
  const uint8_t kIns = 1;  // constants.CINS
  long long total = offs[n_reads];
  if (total <= 0) {
    for (long long i = 0; i < n_reads; i++) finals[i] = 0;
    return 0;
  }
  // Pass 1: junction insertion maxima over reads.
  long long max_match = 0;
  for (long long i = 0; i < n_reads; i++) {
    long long m = 0;
    for (long long p = offs[i]; p < offs[i + 1]; p++) m += cig[p] != kIns;
    if (m > max_match) max_match = m;
  }
  std::vector<int64_t> J(max_match + 1, 0);
  for (long long i = 0; i < n_reads; i++) {
    long long m = 0, run = 0;
    for (long long p = offs[i]; p < offs[i + 1]; p++) {
      if (cig[p] == kIns) {
        run++;
      } else {
        if (run && run > J[m]) J[m] = run;
        run = 0;
        m++;
      }
    }
    if (run && run > J[m]) J[m] = run;
  }
  // S[m] = inclusive prefix sum of J; col(match m) = S[m] + m,
  // col(ins at junction j, rank k) = S[j] - J[j] + j + k.
  std::vector<int64_t> S(max_match + 1, 0);
  int64_t acc = 0;
  for (long long j = 0; j <= max_match; j++) {
    acc += J[j];
    S[j] = acc;
  }
  for (long long i = 0; i < n_reads; i++) {
    long long m = 0, rank = 0;
    int64_t last = -1;
    for (long long p = offs[i]; p < offs[i + 1]; p++) {
      if (cig[p] == kIns) {
        last = S[m] - J[m] + m + rank;
        rank++;
      } else {
        last = S[m] + m;
        m++;
        rank = 0;
      }
      col[p] = (int32_t)last;
    }
    finals[i] = offs[i + 1] > offs[i] ? last + 1 : 0;
  }
  return 0;
}

// Scatters k subreads' per-position values into zeroed (k, W) transport
// arrays: out[i*W + col[p]] = value (positions with col >= W dropped).
// base_to_id: 256-entry vocab LUT applied to bases.
long long dc_scatter_windows(const int32_t* col, const long long* offs,
                             long long k, const uint8_t* bases,
                             const uint8_t* pw, const uint8_t* ip,
                             const uint8_t* base_to_id, long long W,
                             uint8_t* out_bases, uint8_t* out_pw,
                             uint8_t* out_ip) {
  for (long long i = 0; i < k; i++) {
    uint8_t* ob = out_bases + i * W;
    uint8_t* op = out_pw + i * W;
    uint8_t* oi = out_ip + i * W;
    for (long long p = offs[i]; p < offs[i + 1]; p++) {
      int32_t c = col[p];
      if (c < W) {
        ob[c] = base_to_id[bases[p]];
        op[c] = pw[p];
        oi[c] = ip[p];
      }
    }
  }
  return 0;
}

}  // extern "C"
