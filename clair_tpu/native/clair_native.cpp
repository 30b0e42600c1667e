// clair_native: native BAM -> pileup-event engine.
//
// The hot host path of the framework (the reference's bottleneck is the
// equivalent CreateTensor CIGAR walk, README.md:322). This library inflates
// BGZF, parses BAM records, applies the standard filters (exclude flags,
// MAPQ, per-start-position depth cap, soft-clip fraction) and expands
// CIGARs into the flat event arrays the numpy/TPU pipeline consumes —
// replacing the Python per-read loop in clair_tpu.data.pileup.
//
// C ABI (ctypes): see EventBuffers below. All arrays are malloc'd here and
// released with clair_free_events.

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <thread>
#include <vector>
#include <zlib.h>

namespace {

// SAM spec: which CIGAR ops consume query / reference
const bool kConsumesQuery[9] = {true, true, false, false, true, false, false, true, true};
const bool kConsumesRef[9] = {true, false, true, true, false, false, false, true, true};

// BAM 4-bit seq code -> candidate column (A=0 C=1 G=2 T=3, N/other ambiguity
// collapsed like IUPAC_base_to_num with N kept distinct as column 6)
// code order: =ACMGRSVTWYHKDBN
const int8_t kCodeToCol[16] = {
    /*=*/ -1, /*A*/ 0, /*C*/ 1, /*M(A|C)->A*/ 0, /*G*/ 2, /*R(A|G)->A*/ 0,
    /*S(G|C)->C*/ 1, /*V->A*/ 0, /*T*/ 3, /*W(A|T)->A*/ 0, /*Y(C|T)->C*/ 1,
    /*H->A*/ 0, /*K(G|T)->G*/ 2, /*D->A*/ 0, /*B->C*/ 1, /*N*/ 6};

struct Inflated {
  std::vector<uint8_t> data;
  bool ok = false;
};

// Size of the BGZF block starting at raw[offset]: walk the gzip extra
// subfields for BC (SAM spec §4.1). Returns 0 on parse failure.
size_t bgzf_block_size(const std::vector<uint8_t>& raw, size_t offset) {
  if (offset + 18 > raw.size()) return 0;
  if (raw[offset] != 0x1f || raw[offset + 1] != 0x8b) return 0;
  if (!(raw[offset + 3] & 4)) return 0;
  uint16_t xlen;
  memcpy(&xlen, raw.data() + offset + 10, 2);
  size_t cursor = offset + 12, end = cursor + xlen;
  while (cursor + 4 <= end && end <= raw.size()) {
    uint8_t si1 = raw[cursor], si2 = raw[cursor + 1];
    uint16_t slen;
    memcpy(&slen, raw.data() + cursor + 2, 2);
    if (si1 == 'B' && si2 == 'C' && slen == 2) {
      uint16_t bsize_m1;
      memcpy(&bsize_m1, raw.data() + cursor + 4, 2);
      return (size_t)bsize_m1 + 1;
    }
    cursor += 4 + slen;
  }
  return 0;
}

bool inflate_one_block(const uint8_t* src, size_t src_size,
                       std::vector<uint8_t>& dst) {
  // ISIZE (mod 2^32) is the last 4 bytes of the member
  uint32_t isize;
  memcpy(&isize, src + src_size - 4, 4);
  dst.resize(isize);
  if (isize == 0) return true;
  z_stream zs;
  memset(&zs, 0, sizeof(zs));
  if (inflateInit2(&zs, 15 + 16) != Z_OK) return false;
  zs.next_in = const_cast<uint8_t*>(src);
  zs.avail_in = src_size;
  zs.next_out = dst.data();
  zs.avail_out = isize;
  int rc = inflate(&zs, Z_FINISH);
  inflateEnd(&zs);
  return rc == Z_STREAM_END;
}

// Inflate a BGZF file from byte offset `start_coffset`, block-parallel.
// Falls back to streaming zlib when block headers don't parse as BGZF
// (e.g. plain multi-member gzip from our own Python fallback tools).
Inflated inflate_file(const char* path, int64_t start_coffset = 0,
                      int n_threads = 4) {
  Inflated out;
  FILE* fp = fopen(path, "rb");
  if (!fp) return out;
  fseek(fp, 0, SEEK_END);
  long file_size = ftell(fp);
  if (start_coffset >= file_size) {
    fclose(fp);
    out.ok = true;
    return out;
  }
  fseek(fp, start_coffset, SEEK_SET);
  std::vector<uint8_t> raw(file_size - start_coffset);
  if (fread(raw.data(), 1, raw.size(), fp) != raw.size()) {
    fclose(fp);
    return out;
  }
  fclose(fp);

  // scan block boundaries
  std::vector<std::pair<size_t, size_t>> blocks;
  size_t offset = 0;
  bool bgzf_ok = true;
  while (offset < raw.size()) {
    size_t size = bgzf_block_size(raw, offset);
    if (size == 0 || offset + size > raw.size()) {
      bgzf_ok = false;
      break;
    }
    blocks.push_back({offset, size});
    offset += size;
  }

  if (bgzf_ok && !blocks.empty()) {
    std::vector<std::vector<uint8_t>> parts(blocks.size());
    int workers = n_threads > 1 ? n_threads : 1;
    if ((int)blocks.size() < workers) workers = blocks.size();
    std::vector<std::thread> threads;
    std::vector<bool> block_ok(blocks.size(), true);
    for (int t = 0; t < workers; t++) {
      threads.emplace_back([&, t]() {
        for (size_t i = t; i < blocks.size(); i += workers) {
          block_ok[i] = inflate_one_block(
              raw.data() + blocks[i].first, blocks[i].second, parts[i]);
        }
      });
    }
    for (auto& th : threads) th.join();
    size_t total = 0;
    for (size_t i = 0; i < blocks.size(); i++) {
      if (!block_ok[i]) { bgzf_ok = false; break; }
      total += parts[i].size();
    }
    if (bgzf_ok) {
      out.data.reserve(total);
      for (auto& part : parts)
        out.data.insert(out.data.end(), part.begin(), part.end());
      out.ok = true;
      return out;
    }
  }

  // streaming fallback (plain concatenated gzip)
  out.data.clear();
  out.data.reserve(raw.size() * 4);
  z_stream zs;
  memset(&zs, 0, sizeof(zs));
  if (inflateInit2(&zs, 15 + 16) != Z_OK) return out;
  zs.next_in = raw.data();
  zs.avail_in = raw.size();
  std::vector<uint8_t> chunk(1 << 20);
  while (zs.avail_in > 0) {
    zs.next_out = chunk.data();
    zs.avail_out = chunk.size();
    int rc = inflate(&zs, Z_NO_FLUSH);
    size_t produced = chunk.size() - zs.avail_out;
    out.data.insert(out.data.end(), chunk.data(), chunk.data() + produced);
    if (rc == Z_STREAM_END) {
      if (inflateReset2(&zs, 15 + 16) != Z_OK) break;
    } else if (rc != Z_OK) {
      inflateEnd(&zs);
      out.ok = false;
      out.data.clear();
      return out;
    }
  }
  inflateEnd(&zs);
  out.ok = true;
  return out;
}

template <typename T>
T read_le(const uint8_t* p) {
  T v;
  memcpy(&v, p, sizeof(T));
  return v;
}

template <typename T>
T* to_heap(const std::vector<T>& v) {
  T* p = (T*)malloc(v.size() * sizeof(T));
  if (p && !v.empty()) memcpy(p, v.data(), v.size() * sizeof(T));
  return p;
}

}  // namespace

extern "C" {

struct EventBuffers {
  int64_t* match_pos;
  int8_t* match_qcol;
  int8_t* match_strand;
  int64_t n_match;

  int64_t* ins_pos;
  int64_t* ins_adv;
  int8_t* ins_qcol;
  int8_t* ins_strand;
  int64_t n_ins;

  int64_t* del_pos;
  int8_t* del_strand;
  int64_t n_del;

  int64_t* ins_op_pos;
  int64_t n_ins_op;
  int64_t* del_op_pos;
  int64_t n_del_op;
  int64_t* ins_op_len;
  int64_t* del_op_len;

  int64_t n_reads_used;
};

// Scan one contig's reads and emit flat event arrays.
// ref_id: target reference index (from the BAM header, resolved by caller).
// start/end: 0-based half-open region filter (-1 -> whole contig).
// start_coffset/start_uoffset: BAI seek point (compressed byte offset of a
// BGZF block + offset within its inflated data); pass -1/-1 to scan from
// the top of the file (the header is then parsed and skipped).
// Returns 0 on success.
int clair_bam_events(const char* path, int32_t ref_id, int64_t start,
                     int64_t end, int32_t exclude_flag, int32_t min_mapq,
                     int32_t dcov, int32_t softclip_filter,
                     int64_t start_coffset, int32_t start_uoffset,
                     EventBuffers* out) {
  memset(out, 0, sizeof(*out));
  bool seeked = start_coffset >= 0 && start_uoffset >= 0;
  Inflated inflated = inflate_file(path, seeked ? start_coffset : 0);
  if (!inflated.ok) return 1;
  const uint8_t* p = inflated.data.data();
  const uint8_t* pe = p + inflated.data.size();

  if (seeked) {
    if (start_uoffset > (int64_t)inflated.data.size()) return 3;
    p += start_uoffset;
  } else {
    if (pe - p < 8 || memcmp(p, "BAM\x01", 4) != 0) return 2;
    int32_t l_text = read_le<int32_t>(p + 4);
    p += 8 + l_text;
    int32_t n_ref = read_le<int32_t>(p);
    p += 4;
    for (int i = 0; i < n_ref; i++) {
      int32_t l_name = read_le<int32_t>(p);
      p += 4 + l_name + 4;
    }
  }

  std::vector<int64_t> match_pos, ins_pos, ins_adv, del_pos, ins_op, del_op,
      ins_op_len, del_op_len;
  std::vector<int8_t> match_qcol, match_strand, ins_qcol, ins_strand, del_strand;
  match_pos.reserve(1 << 20);
  match_qcol.reserve(1 << 20);
  match_strand.reserve(1 << 20);

  int64_t previous_pos = -1;
  int32_t same_pos_count = 0;
  int64_t reads_used = 0;

  while (pe - p >= 4) {
    int32_t block_size = read_le<int32_t>(p);
    p += 4;
    if (pe - p < block_size) break;
    const uint8_t* rec = p;
    p += block_size;

    int32_t rec_ref = read_le<int32_t>(rec);
    int64_t pos = read_le<int32_t>(rec + 4);
    uint8_t l_read_name = rec[8];
    uint8_t mapq = rec[9];
    uint16_t n_cigar = read_le<uint16_t>(rec + 12);
    uint16_t flag = read_le<uint16_t>(rec + 14);
    // l_seq at rec+16 is implied by the CIGAR walk; not read directly

    if (rec_ref != ref_id) {
      if (ref_id >= 0 && rec_ref > ref_id) break;  // sorted past target
      continue;
    }
    if (flag & exclude_flag) continue;
    if (mapq < min_mapq) continue;
    if (end >= 0 && pos >= end) break;

    const uint8_t* cigar_p = rec + 32 + l_read_name;
    const uint8_t* seq_p = cigar_p + 4 * n_cigar;

    // reference span + soft-clip fraction in one pass
    int64_t ref_len = 0, total_len = 0, soft_len = 0;
    for (int i = 0; i < n_cigar; i++) {
      uint32_t cv = read_le<uint32_t>(cigar_p + 4 * i);
      uint32_t op = cv & 0xF, len = cv >> 4;
      total_len += len;
      if (op < 9 && kConsumesRef[op]) ref_len += len;
      if (op == 4) soft_len += len;
    }
    if (start >= 0 && pos + ref_len <= start) continue;
    if (softclip_filter &&
        1.0 - (double)soft_len / (double)(total_len + 1) < 0.55)
      continue;

    // depth cap per start position
    if (pos != previous_pos) {
      previous_pos = pos;
      same_pos_count = 0;
    } else {
      same_pos_count++;
      if (dcov > 0 && same_pos_count >= dcov) continue;
    }
    reads_used++;

    int8_t strand = (flag & 16) ? 1 : 0;
    int64_t refp = pos;
    int64_t qp = 0;
    for (int i = 0; i < n_cigar; i++) {
      uint32_t cv = read_le<uint32_t>(cigar_p + 4 * i);
      uint32_t op = cv & 0xF;
      int64_t len = cv >> 4;
      switch (op) {
        case 0: case 7: case 8: {  // M, =, X
          for (int64_t k = 0; k < len; k++) {
            int64_t q = qp + k;
            uint8_t code = seq_p[q >> 1];
            code = (q & 1) ? (code & 0xF) : (code >> 4);
            match_pos.push_back(refp + k);
            match_qcol.push_back(kCodeToCol[code]);
            match_strand.push_back(strand);
          }
          refp += len;
          qp += len;
          break;
        }
        case 1: {  // I
          ins_op.push_back(refp);
          ins_op_len.push_back(len);
          for (int64_t k = 0; k < len; k++) {
            int64_t q = qp + k;
            uint8_t code = seq_p[q >> 1];
            code = (q & 1) ? (code & 0xF) : (code >> 4);
            ins_pos.push_back(refp);
            ins_adv.push_back(k);
            ins_qcol.push_back(kCodeToCol[code]);
            ins_strand.push_back(strand);
          }
          qp += len;
          break;
        }
        case 2: {  // D
          del_op.push_back(refp);
          del_op_len.push_back(len);
          for (int64_t k = 0; k < len; k++) {
            del_pos.push_back(refp + k);
            del_strand.push_back(strand);
          }
          refp += len;
          break;
        }
        case 3:  // N (ref skip)
          refp += len;
          break;
        case 4:  // S
          qp += len;
          break;
        default:  // H, P: no movement
          break;
      }
    }
  }

  out->match_pos = to_heap(match_pos);
  out->match_qcol = to_heap(match_qcol);
  out->match_strand = to_heap(match_strand);
  out->n_match = match_pos.size();
  out->ins_pos = to_heap(ins_pos);
  out->ins_adv = to_heap(ins_adv);
  out->ins_qcol = to_heap(ins_qcol);
  out->ins_strand = to_heap(ins_strand);
  out->n_ins = ins_pos.size();
  out->del_pos = to_heap(del_pos);
  out->del_strand = to_heap(del_strand);
  out->n_del = del_pos.size();
  out->ins_op_pos = to_heap(ins_op);
  out->n_ins_op = ins_op.size();
  out->del_op_pos = to_heap(del_op);
  out->n_del_op = del_op.size();
  out->ins_op_len = to_heap(ins_op_len);
  out->del_op_len = to_heap(del_op_len);
  out->n_reads_used = reads_used;
  return 0;
}

void clair_free_events(EventBuffers* buffers) {
  free(buffers->match_pos);
  free(buffers->match_qcol);
  free(buffers->match_strand);
  free(buffers->ins_pos);
  free(buffers->ins_adv);
  free(buffers->ins_qcol);
  free(buffers->ins_strand);
  free(buffers->del_pos);
  free(buffers->del_strand);
  free(buffers->ins_op_pos);
  free(buffers->del_op_pos);
  free(buffers->ins_op_len);
  free(buffers->del_op_len);
  memset(buffers, 0, sizeof(*buffers));
}

}  // extern "C"
