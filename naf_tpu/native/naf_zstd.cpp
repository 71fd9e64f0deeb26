// naf_zstd — a from-scratch zstd *encoder* emitting RFC 8878 frames.
//
// This is the native entropy stack of SURVEY.md §7 step 6: the framework's
// own compressor for the hot SEQ/QUAL sections, independent of libzstd.
// Any spec-conformant zstd decoder (including the reference unnaf's
// vendored libzstd) decodes its output, so archives written with this
// engine remain fully reference-compatible.
//
// Design: greedy hash-table LZ77 match finding (the data-parallel half —
// the same per-position hashing/scoring the Pallas device kernel computes),
// then the inherently-serial bitstream packing: 128 KB blocks, Huffman
// literals (canonical 11-bit code, direct or FSE-compressed weights, 1 or
// 4 backward streams), sequences coded with the spec's PREDEFINED FSE
// distributions (RFC 8878 §3.1.1.3.2.2).  Incompressible blocks fall back
// to raw blocks, literal-only blocks cover pure-entropy data.
//
// The implementation follows the procedures *as specified in RFC 8878*
// (FSE state machine, interleaved backward bitstream, code/baseline
// tables); it shares no code with libzstd.

#include <cstdint>
#include <cstring>

extern "C" {

// ---------------------------------------------------------------------------
// predefined distributions (RFC 8878 §3.1.1.3.2.2)
// ---------------------------------------------------------------------------

static const int16_t LL_NORM[36] = {
    4, 3, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 1, 1, 1,
    2, 2, 2, 2, 2, 2, 2, 2, 2, 3, 2, 1, 1, 1, 1, 1,
    -1, -1, -1, -1};
static const int16_t ML_NORM[53] = {
    1, 4, 3, 2, 2, 2, 2, 2, 2, 1, 1, 1, 1, 1, 1, 1,
    1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1,
    1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, -1, -1,
    -1, -1, -1, -1, -1};
static const int16_t OF_NORM[29] = {
    1, 1, 1, 1, 1, 1, 2, 2, 2, 1, 1, 1, 1, 1, 1, 1,
    1, 1, 1, 1, 1, 1, 1, 1, -1, -1, -1, -1, -1};

static const int LL_LOG = 6, ML_LOG = 6, OF_LOG = 5;

// literal-length codes >= 16: baselines and extra bits (RFC table)
static const uint32_t LL_BASE[20] = {
    16, 18, 20, 22, 24, 28, 32, 40, 48, 64, 128, 256, 512, 1024,
    2048, 4096, 8192, 16384, 32768, 65536};
static const uint8_t LL_BITS[20] = {
    1, 1, 1, 1, 2, 2, 3, 3, 4, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15, 16};

// match-length codes >= 32 (match length value >= 35)
static const uint32_t ML_BASE[21] = {
    35, 37, 39, 41, 43, 47, 51, 59, 67, 83, 99, 131, 259, 515, 1027,
    2051, 4099, 8195, 16387, 32771, 65539};
static const uint8_t ML_BITS[21] = {
    1, 1, 1, 1, 2, 2, 3, 3, 4, 4, 5, 7, 8, 9, 10, 11, 12, 13, 14, 15, 16};

static inline int highbit32(uint32_t v) { return 31 - __builtin_clz(v); }

// ---------------------------------------------------------------------------
// FSE encoder tables (FSE_buildCTable equivalent, built from the normalized
// counts above; procedure per the FSE/zstd specification)
// ---------------------------------------------------------------------------

struct FseEnc {
  uint16_t next_state[64];          // tableSize <= 64 here
  int32_t delta_nb_bits[64];        // per symbol
  int32_t delta_find_state[64];
  int table_log;
};

static void fse_build(const int16_t *norm, int n_sym, int table_log,
                      FseEnc *e) {
  const int table_size = 1 << table_log;
  const int mask = table_size - 1;
  const int step = (table_size >> 1) + (table_size >> 3) + 3;

  uint8_t table_symbol[64];
  int high_threshold = table_size - 1;
  int cumul[64 + 2];
  cumul[0] = 0;
  for (int s = 0; s < n_sym; s++) {
    if (norm[s] == -1) {
      cumul[s + 1] = cumul[s] + 1;
      table_symbol[high_threshold--] = (uint8_t)s;
    } else {
      cumul[s + 1] = cumul[s] + norm[s];
    }
  }
  int position = 0;
  for (int s = 0; s < n_sym; s++) {
    for (int i = 0; i < norm[s]; i++) {
      table_symbol[position] = (uint8_t)s;
      position = (position + step) & mask;
      while (position > high_threshold) position = (position + step) & mask;
    }
  }
  int cumul_tmp[64 + 2];
  std::memcpy(cumul_tmp, cumul, sizeof(cumul));
  for (int u = 0; u < table_size; u++) {
    uint8_t s = table_symbol[u];
    e->next_state[cumul_tmp[s]++] = (uint16_t)(table_size + u);
  }
  int total = 0;
  for (int s = 0; s < n_sym; s++) {
    if (norm[s] == 0) {
      e->delta_nb_bits[s] = ((table_log + 1) << 16) - (1 << table_log);
      e->delta_find_state[s] = 0;
    } else if (norm[s] == -1 || norm[s] == 1) {
      e->delta_nb_bits[s] = (table_log << 16) - (1 << table_log);
      e->delta_find_state[s] = total - 1;
      total += 1;
    } else {
      int max_bits_out = table_log - highbit32((uint32_t)(norm[s] - 1));
      int min_state_plus = norm[s] << max_bits_out;
      e->delta_nb_bits[s] = (max_bits_out << 16) - min_state_plus;
      e->delta_find_state[s] = total - norm[s];
      total += norm[s];
    }
  }
  e->table_log = table_log;
}

static FseEnc g_ll, g_ml, g_of;
static bool g_fse_ready = false;

static void fse_init_all() {
  if (g_fse_ready) return;
  fse_build(LL_NORM, 36, LL_LOG, &g_ll);
  fse_build(ML_NORM, 53, ML_LOG, &g_ml);
  fse_build(OF_NORM, 29, OF_LOG, &g_of);
  g_fse_ready = true;
}

// ---------------------------------------------------------------------------
// bit writer (LSB-first accumulate; decoder reads back-to-front)
// ---------------------------------------------------------------------------

struct BitW {
  uint8_t *out;
  uint64_t pos = 0;
  uint64_t acc = 0;
  int nbits = 0;
  inline void add(uint32_t val, int bits) {
    acc |= (uint64_t)(val & ((bits < 32 ? (1u << bits) : 0u) - 1)) << nbits;
    nbits += bits;
    while (nbits >= 8) { out[pos++] = (uint8_t)acc; acc >>= 8; nbits -= 8; }
  }
  inline uint64_t close() {
    add(1, 1);                       // end-of-stream marker bit
    if (nbits) { out[pos++] = (uint8_t)acc; acc = 0; nbits = 0; }
    return pos;
  }
};

struct FseState {
  uint32_t value;
  const FseEnc *t;
  inline void init(int symbol) {
    int nb = (t->delta_nb_bits[symbol] + (1 << 15)) >> 16;
    value = (uint32_t)((nb << 16) - t->delta_nb_bits[symbol]);
    value = t->next_state[(value >> nb) + t->delta_find_state[symbol]];
  }
  inline void encode(BitW &bw, int symbol) {
    uint32_t nb = (value + (uint32_t)t->delta_nb_bits[symbol]) >> 16;
    bw.add(value, (int)nb);
    value = t->next_state[(value >> nb) + t->delta_find_state[symbol]];
  }
  inline void flush(BitW &bw) { bw.add(value, t->table_log); }
};

// ---------------------------------------------------------------------------
// Huffman literals (RFC 8878 §4.2): canonical code limited to 11 bits,
// weights emitted directly (4-bit) or FSE-compressed (two interleaved
// states), 1 or 4 backward bitstreams.
// ---------------------------------------------------------------------------

static const int HUF_MAX_BITS = 11;

struct HufCode { uint16_t val; uint8_t nbits; };

// build code lengths <= HUF_MAX_BITS; returns max symbol used + 1, or 0 if
// not applicable (fewer than 2 distinct symbols)
static int huf_build(uint32_t *count, HufCode *codes, int *max_bits_out) {
  int alphabet = 0;
  int distinct = 0;
  for (int s = 0; s < 256; s++) {
    if (count[s]) { alphabet = s + 1; distinct++; }
  }
  if (distinct < 2) return 0;

  uint32_t cnt[256];
  uint8_t depth[256];
  {
    // two-queue Huffman over (count, node) pairs
    struct Node { uint64_t w; int l, r, sym; };
    Node nodes[512];
    int leaf_idx[256], n_leaves = 0;
    for (int s = 0; s < alphabet; s++)
      cnt[s] = count[s];
    for (int s = 0; s < alphabet; s++)
      if (cnt[s]) {
        nodes[n_leaves] = {cnt[s], -1, -1, s};
        leaf_idx[n_leaves] = n_leaves;
        n_leaves++;
      }
    // sort leaves by weight (insertion sort fine for 256)
    for (int i = 1; i < n_leaves; i++) {
      Node t = nodes[i];
      int j = i - 1;
      while (j >= 0 && nodes[j].w > t.w) { nodes[j + 1] = nodes[j]; j--; }
      nodes[j + 1] = t;
    }
    (void)leaf_idx;
    int n_nodes = n_leaves;
    int q1 = 0;            // next unconsumed leaf
    int q2 = n_leaves;     // internal nodes appended [q2, n_nodes)
    int q2h = n_leaves;
    auto take = [&]() -> int {
      bool leaf_ok = q1 < n_leaves;
      bool int_ok = q2h < n_nodes;
      if (leaf_ok && (!int_ok || nodes[q1].w <= nodes[q2h].w)) return q1++;
      return q2h++;
    };
    (void)q2;
    while ((n_leaves - q1) + (n_nodes - q2h) > 1) {
      int a = take(), b = take();
      nodes[n_nodes] = {nodes[a].w + nodes[b].w, a, b, -1};
      n_nodes++;
    }
    // depths via DFS from root
    int root = n_nodes - 1;
    struct { int node, d; } stack[512];
    int sp = 0;
    stack[sp++] = {root, 0};
    int maxd = 0;
    while (sp) {
      auto fr = stack[--sp];
      const Node &nd = nodes[fr.node];
      if (nd.sym >= 0) {
        depth[nd.sym] = (uint8_t)(fr.d ? fr.d : 1);
        if (fr.d > maxd) maxd = fr.d;
      } else {
        stack[sp++] = {nd.l, fr.d + 1};
        stack[sp++] = {nd.r, fr.d + 1};
      }
    }
    (void)maxd;
  }

  // limit to HUF_MAX_BITS: clamp, then repair the Kraft sum exactly
  {
    const int target = 1 << HUF_MAX_BITS;
    int64_t kraft = 0;
    for (int s = 0; s < alphabet; s++)
      if (count[s]) {
        if (depth[s] > HUF_MAX_BITS) depth[s] = HUF_MAX_BITS;
        kraft += 1 << (HUF_MAX_BITS - depth[s]);
      }
    while (kraft > target) {
      int64_t need = kraft - target;
      int best = -1;
      for (int s = 0; s < alphabet; s++) {
        if (!count[s] || depth[s] >= HUF_MAX_BITS) continue;
        int64_t red = 1 << (HUF_MAX_BITS - depth[s] - 1);
        if (red <= need && (best < 0 || count[s] < count[best])) best = s;
      }
      if (best < 0) {
        for (int s = 0; s < alphabet; s++) {
          if (!count[s] || depth[s] >= HUF_MAX_BITS) continue;
          if (best < 0 || depth[s] > depth[best]) best = s;
        }
        if (best < 0) return 0;   // cannot happen with >= 2 symbols
      }
      kraft -= 1 << (HUF_MAX_BITS - depth[best] - 1);
      depth[best]++;
    }
    while (kraft < target) {
      int best = -1;
      for (int s = 0; s < alphabet; s++) {
        if (!count[s] || depth[s] <= 1) continue;
        int64_t gain = 1 << (HUF_MAX_BITS - depth[s]);
        if (kraft + gain <= target &&
            (best < 0 || count[s] > count[best])) best = s;
      }
      if (best < 0) return 0;     // depth-11 symbols guarantee granularity 1
      kraft += 1 << (HUF_MAX_BITS - depth[best]);
      depth[best]--;
    }
  }

  int maxb = 0;
  for (int s = 0; s < alphabet; s++)
    if (count[s] && depth[s] > maxb) maxb = depth[s];
  // canonical value assignment (smallest values to longest codes, symbol
  // order within a length class)
  uint16_t nb_per_rank[16] = {0}, val_per_rank[16] = {0};
  for (int s = 0; s < alphabet; s++)
    if (count[s]) nb_per_rank[depth[s]]++;
  uint16_t min = 0;
  for (int b = maxb; b > 0; b--) {
    val_per_rank[b] = min;
    min = (uint16_t)((min + nb_per_rank[b]) >> 1);
  }
  for (int s = 0; s < alphabet; s++) {
    if (count[s]) {
      codes[s].nbits = depth[s];
      codes[s].val = val_per_rank[depth[s]]++;
    } else {
      codes[s].nbits = 0;
      codes[s].val = 0;
    }
  }
  *max_bits_out = maxb;
  return alphabet;
}

// FSE normalization of the weight histogram (max table log 6)
static int fse_normalize(const uint32_t *count, int n_sym, int total,
                         int table_log, int16_t *norm) {
  int table_size = 1 << table_log;
  int distributed = 0;
  int largest = 0;
  for (int s = 0; s < n_sym; s++) {
    if (count[s] == 0) { norm[s] = 0; continue; }
    int64_t p = ((int64_t)count[s] * table_size) / total;
    if (p == 0) p = (int64_t)count[s] * table_size * 2 >= total ? 1 : -1;
    norm[s] = (int16_t)p;
    distributed += p > 0 ? (int)p : 1;
    if (norm[s] > norm[largest]) largest = s;
  }
  int delta = table_size - distributed;
  // adjust on the most probable symbol
  if (norm[largest] + delta < 1) return -1;
  norm[largest] = (int16_t)(norm[largest] + delta);
  // a 100% symbol is not representable as an FSE stream (all state
  // transitions would read 0 bits); callers must use RLE/direct forms
  if (norm[largest] >= table_size) return -1;
  return 0;
}

// FSE_writeNCount equivalent: table description, forward LSB-first stream
static int fse_write_ncount(const int16_t *norm, int n_sym, int table_log,
                            uint8_t *dst, int cap) {
  uint64_t bit_stream = (uint64_t)(table_log - 5);
  int bit_count = 4;
  int w = 0;
  int remaining = (1 << table_log) + 1;
  int threshold = 1 << table_log;
  int nb_bits = table_log + 1;
  bool previous_is0 = false;
  int s = 0;
  while (remaining > 1 && s < n_sym) {
    if (previous_is0) {
      int start = s;
      while (s < n_sym && norm[s] == 0) s++;
      if (s == n_sym) return -1;
      while (s >= start + 24) {
        start += 24;
        bit_stream |= 0xFFFFull << bit_count;
        bit_count += 16;
        while (bit_count > 16) {
          if (w + 2 > cap) return -1;
          dst[w++] = (uint8_t)bit_stream;
          dst[w++] = (uint8_t)(bit_stream >> 8);
          bit_stream >>= 16; bit_count -= 16;
        }
      }
      while (s >= start + 3) {
        start += 3;
        bit_stream |= 3ull << bit_count;
        bit_count += 2;
      }
      bit_stream |= (uint64_t)(s - start) << bit_count;
      bit_count += 2;
    }
    int count = norm[s++];
    int max = (2 * threshold - 1) - remaining;
    remaining -= count < 0 ? -count : count;
    count++;                       // +1 encoding
    if (count >= threshold) count += max;
    bit_stream |= (uint64_t)count << bit_count;
    bit_count += nb_bits;
    bit_count -= (count < max);
    previous_is0 = (count == 1);
    if (remaining < 1) return -1;
    while (remaining < threshold) { nb_bits--; threshold >>= 1; }
    while (bit_count > 16) {
      if (w + 2 > cap) return -1;
      dst[w++] = (uint8_t)bit_stream;
      dst[w++] = (uint8_t)(bit_stream >> 8);
      bit_stream >>= 16; bit_count -= 16;
    }
  }
  if (remaining != 1) return -1;
  while (bit_count > 0) {
    if (w + 1 > cap) return -1;
    dst[w++] = (uint8_t)bit_stream;
    bit_stream >>= 8; bit_count -= 8;
  }
  return w;
}

// FSE-compress the weight bytes with two interleaved states
static int fse_compress_weights(const uint8_t *w8, int n, uint8_t *dst,
                                int cap) {
  uint32_t count[16] = {0};
  int max_sym = 0;
  for (int i = 0; i < n; i++) {
    count[w8[i]]++;
    if (w8[i] > max_sym) max_sym = w8[i];
  }
  if (n < 4) return -1;
  int table_log = 6;
  while ((1 << (table_log - 1)) > n) table_log--;   // don't over-size
  if (table_log < 5) table_log = 5;   // header stores accuracy_log - 5
  int16_t norm[16];
  if (fse_normalize(count, max_sym + 1, n, table_log, norm) != 0) return -1;
  int hdr = fse_write_ncount(norm, max_sym + 1, table_log, dst, cap);
  if (hdr < 0) return -1;
  FseEnc enc;
  fse_build(norm, max_sym + 1, table_log, &enc);
  if (hdr + n + 16 > cap) return -1;    // worst case ~1 byte per weight
  BitW bw{dst + hdr};
  FseState s1{0, &enc}, s2{0, &enc};
  int ip = n;
  if (n & 1) {
    s1.init(w8[--ip]);
    s2.init(w8[--ip]);
    s1.encode(bw, w8[--ip]);
  } else {
    s2.init(w8[--ip]);
    s1.init(w8[--ip]);
  }
  while (ip > 0) {
    s2.encode(bw, w8[--ip]);
    s1.encode(bw, w8[--ip]);
  }
  s2.flush(bw);
  s1.flush(bw);
  uint64_t bits = bw.close();
  // the tree-description header byte encodes this size and must be < 128
  if (hdr + (int)bits >= 128) return -1;
  return hdr + (int)bits;
}

// encode one Huffman stream (backward bitstream) of src into dst
static uint64_t huf_stream(const uint8_t *src, uint32_t n,
                           const HufCode *codes, uint8_t *dst) {
  BitW bw{dst};
  int i = (int)n - 1;
  for (; i >= 1; i -= 2) {   // pair symbols: one accumulate per 2 codes
    const HufCode &c1 = codes[src[i]];
    const HufCode &c2 = codes[src[i - 1]];
    bw.add((uint32_t)c1.val | ((uint32_t)c2.val << c1.nbits),
           c1.nbits + c2.nbits);
  }
  if (i == 0) {
    const HufCode &c = codes[src[0]];
    bw.add(c.val, c.nbits);
  }
  return bw.close();
}

// write a full Compressed_Literals_Block; returns bytes or 0 if raw is better
static uint64_t write_huf_literals(const uint8_t *lits, uint32_t n,
                                   uint8_t *dst, uint64_t cap) {
  if (n < 64) return 0;
  uint32_t count[256] = {0};
  for (uint32_t i = 0; i < n; i++) count[lits[i]]++;
  HufCode codes[256];
  int max_bits;
  int alphabet = huf_build(count, codes, &max_bits);
  if (alphabet == 0) return 0;

  // weights: symbols 0 .. alphabet-2 explicit, last implicit
  uint8_t weights[256];
  for (int s = 0; s < alphabet - 1; s++)
    weights[s] = codes[s].nbits ? (uint8_t)(max_bits + 1 - codes[s].nbits) : 0;
  int n_weights = alphabet - 1;

  uint8_t tree[600];
  int tree_n;
  int fse_n = fse_compress_weights(weights, n_weights, tree + 1, 560);
  int direct_n = 1 + (n_weights + 1) / 2;
  if (fse_n > 0 && fse_n < 128 &&
      (n_weights > 128 || 1 + fse_n < direct_n)) {
    tree[0] = (uint8_t)fse_n;
    tree_n = 1 + fse_n;
  } else if (n_weights <= 128) {
    tree[0] = (uint8_t)(127 + n_weights);
    int t = 1;
    for (int i = 0; i < n_weights; i += 2) {
      uint8_t hi = weights[i];
      uint8_t lo = (i + 1 < n_weights) ? weights[i + 1] : 0;
      tree[t++] = (uint8_t)((hi << 4) | lo);
    }
    tree_n = t;
  } else {
    return 0;
  }

  // encode streams into scratch, then assemble with exact-size header
  static thread_local uint8_t streams[(256 << 10) + 1024];
  uint64_t comp;
  uint64_t s_sz[4] = {0, 0, 0, 0};
  bool four = n > 1023;
  if (!four) {
    comp = huf_stream(lits, n, codes, streams);
  } else {
    uint32_t part = (n + 3) / 4;
    uint64_t off = 0;
    for (int k = 0; k < 4; k++) {
      uint32_t a = part * k;
      uint32_t b = k == 3 ? n : part * (k + 1);
      s_sz[k] = huf_stream(lits + a, b - a, codes, streams + off);
      if (s_sz[k] > 65535) return 0;
      off += s_sz[k];
    }
    comp = off + 6;                // + jump table
  }
  uint64_t total_comp = (uint64_t)tree_n + comp;

  uint64_t w = 0;
  if (!four) {
    if (n > 1023 || total_comp > 1023) return 0;
    uint32_t h = 2u | (0u << 2) | (n << 4) | ((uint32_t)total_comp << 14);
    if (w + 3 + total_comp > cap) return 0;
    dst[w++] = (uint8_t)h; dst[w++] = (uint8_t)(h >> 8);
    dst[w++] = (uint8_t)(h >> 16);
  } else if (n <= 16383 && total_comp <= 16383) {
    uint64_t h = 2u | (2u << 2) | ((uint64_t)n << 4)
        | ((uint64_t)total_comp << 18);
    if (w + 4 + total_comp > cap) return 0;
    dst[w++] = (uint8_t)h; dst[w++] = (uint8_t)(h >> 8);
    dst[w++] = (uint8_t)(h >> 16); dst[w++] = (uint8_t)(h >> 24);
  } else {
    uint64_t h = 2u | (3u << 2) | ((uint64_t)n << 4)
        | ((uint64_t)total_comp << 22);
    if (w + 5 + total_comp > cap) return 0;
    dst[w++] = (uint8_t)h; dst[w++] = (uint8_t)(h >> 8);
    dst[w++] = (uint8_t)(h >> 16); dst[w++] = (uint8_t)(h >> 24);
    dst[w++] = (uint8_t)(h >> 32);
  }
  std::memcpy(dst + w, tree, tree_n);
  w += tree_n;
  if (four) {
    dst[w++] = (uint8_t)s_sz[0]; dst[w++] = (uint8_t)(s_sz[0] >> 8);
    dst[w++] = (uint8_t)s_sz[1]; dst[w++] = (uint8_t)(s_sz[1] >> 8);
    dst[w++] = (uint8_t)s_sz[2]; dst[w++] = (uint8_t)(s_sz[2] >> 8);
    std::memcpy(dst + w, streams, s_sz[0] + s_sz[1] + s_sz[2] + s_sz[3]);
    w += s_sz[0] + s_sz[1] + s_sz[2] + s_sz[3];
  } else {
    std::memcpy(dst + w, streams, comp);
    w += comp;
  }
  if (w >= n) return 0;           // raw literals are smaller
  return w;
}

// ---------------------------------------------------------------------------
// sequence code mapping
// ---------------------------------------------------------------------------

static inline int ll_code(uint32_t ll, uint32_t *extra, int *bits) {
  if (ll < 16) { *extra = 0; *bits = 0; return (int)ll; }
  for (int i = 19; i >= 0; i--) {
    if (ll >= LL_BASE[i]) {
      *extra = ll - LL_BASE[i];
      *bits = LL_BITS[i];
      return 16 + i;
    }
  }
  *extra = 0; *bits = 0; return 15;   // unreachable
}

static inline int ml_code(uint32_t ml, uint32_t *extra, int *bits) {
  if (ml < 35) { *extra = 0; *bits = 0; return (int)(ml - 3); }
  for (int i = 20; i >= 0; i--) {
    if (ml >= ML_BASE[i]) {
      *extra = ml - ML_BASE[i];
      *bits = ML_BITS[i];
      return 32 + i;
    }
  }
  *extra = 0; *bits = 0; return 31;   // unreachable
}

// ---------------------------------------------------------------------------
// block compression: greedy hash match find + predefined-FSE sequences
// ---------------------------------------------------------------------------

struct Seq { uint32_t lit_len, match_len, offset; };

static inline uint32_t read32(const uint8_t *p) {
  uint32_t v; std::memcpy(&v, p, 4); return v;
}

static const int HLOG = 17;
static const uint32_t MAXDIST = (1u << 21) - 16;

struct MatchCtx {
  int32_t *table;   // 1 << HLOG entries, value = src_pos + 1 (0 = empty)
};

static inline uint32_t hash4(uint32_t v) {
  return (v * 2654435761u) >> (32 - HLOG);
}

// collect greedy sequences for src[block_start, block_end) with history
// from src[0, block_start)
static uint32_t find_sequences(const uint8_t *src, uint64_t block_start,
                               uint64_t block_end, uint64_t src_len,
                               MatchCtx &ctx, Seq *seqs, uint32_t max_seqs,
                               uint8_t *literals, uint32_t *lit_total,
                               uint32_t *last_lits) {
  uint64_t pos = block_start, anchor = block_start;
  uint32_t n = 0, lit_n = 0;
  const uint64_t limit = block_end >= 12 ? block_end - 12 : 0;
  (void)src_len;
  while (pos < limit && n < max_seqs) {
    uint32_t h = hash4(read32(src + pos));
    int64_t cand = (int64_t)ctx.table[h] - 1;
    ctx.table[h] = (int32_t)(pos + 1);
    if (cand >= 0 && pos - (uint64_t)cand <= MAXDIST &&
        read32(src + cand) == read32(src + pos)) {
      // extend
      uint64_t m = 4;
      const uint64_t room = block_end - pos;
      while (m < room && src[cand + m] == src[pos + m]) m++;
      // short matches on high-entropy data cost more in sequence bits than
      // Huffman-coded literals; skip them (zstd's own lazy matchers make
      // the same cost call)
      if (m < 6) { pos++; continue; }
      uint32_t ll = (uint32_t)(pos - anchor);
      std::memcpy(literals + lit_n, src + anchor, ll);
      lit_n += ll;
      seqs[n].lit_len = ll;
      seqs[n].match_len = (uint32_t)m;
      seqs[n].offset = (uint32_t)(pos - (uint64_t)cand);
      n++;
      // sparse hash insertion inside the match keeps speed up
      if (m > 2 && pos + m < limit) {
        uint64_t ins = pos + (m >> 1);
        ctx.table[hash4(read32(src + ins))] = (int32_t)(ins + 1);
        ctx.table[hash4(read32(src + pos + m - 2))] =
            (int32_t)(pos + m - 1);
      }
      pos += m;
      anchor = pos;
    } else {
      pos++;
    }
  }
  uint32_t tail = (uint32_t)(block_end - anchor);
  std::memcpy(literals + lit_n, src + anchor, tail);
  lit_n += tail;
  *lit_total = lit_n;
  *last_lits = tail;
  return n;
}

// serialize one compressed block body; returns size or 0 if not profitable
static uint64_t write_compressed_block(const Seq *seqs, uint32_t n_seqs,
                                       const uint8_t *literals,
                                       uint32_t lit_n, uint64_t raw_size,
                                       uint8_t *dst, uint64_t dst_cap) {
  fse_init_all();
  uint64_t w = write_huf_literals(literals, lit_n, dst, dst_cap);
  if (w == 0) {
    // raw literals section
    if (lit_n < 32) {
      if (w + 1 + lit_n > dst_cap) return 0;
      dst[w++] = (uint8_t)(lit_n << 3);               // type 0, format 00
    } else if (lit_n < 4096) {
      if (w + 2 + lit_n > dst_cap) return 0;
      uint32_t h = 0 | (1u << 2) | (lit_n << 4);      // format 01, 12 bits
      dst[w++] = (uint8_t)h;
      dst[w++] = (uint8_t)(h >> 8);
    } else {
      if (w + 3 + lit_n > dst_cap) return 0;
      uint32_t h = 0 | (3u << 2) | (lit_n << 4);      // format 11, 20 bits
      dst[w++] = (uint8_t)h;
      dst[w++] = (uint8_t)(h >> 8);
      dst[w++] = (uint8_t)(h >> 16);
    }
    std::memcpy(dst + w, literals, lit_n);
    w += lit_n;
  }

  if (n_seqs == 0) {
    // literals-only block (pure entropy coding, e.g. random packed DNA)
    if (w + 1 >= raw_size || w + 1 > dst_cap) return 0;
    dst[w++] = 0;                 // Number_of_Sequences = 0, nothing follows
    return w;
  }

  // sequences header
  if (n_seqs < 128) {
    dst[w++] = (uint8_t)n_seqs;
  } else if (n_seqs < 0x7F00) {
    dst[w++] = (uint8_t)((n_seqs >> 8) + 0x80);
    dst[w++] = (uint8_t)n_seqs;
  } else {
    dst[w++] = 0xFF;
    dst[w++] = (uint8_t)(n_seqs - 0x7F00);
    dst[w++] = (uint8_t)((n_seqs - 0x7F00) >> 8);
  }
  dst[w++] = 0x00;   // all three modes predefined

  // the interleaved backward FSE bitstream (RFC 8878 §3.1.1.3.2.1.2;
  // write order mirrors the specified decode order exactly)
  if (w + 16 > dst_cap) return 0;
  BitW bw{dst + w};

  // per-sequence codes
  const Seq &last = seqs[n_seqs - 1];
  uint32_t ll_x, ml_x; int ll_b, ml_b;
  int llc = ll_code(last.lit_len, &ll_x, &ll_b);
  int mlc = ml_code(last.match_len, &ml_x, &ml_b);
  uint32_t ofv = last.offset + 3;
  int ofc = highbit32(ofv);
  uint32_t of_x = ofv - (1u << ofc);

  FseState sll{0, &g_ll}, sml{0, &g_ml}, sof{0, &g_of};
  sml.init(mlc);
  sof.init(ofc);
  sll.init(llc);
  bw.add(ll_x, ll_b);
  bw.add(ml_x, ml_b);
  bw.add(of_x, ofc);

  for (int i = (int)n_seqs - 2; i >= 0; i--) {
    const Seq &q = seqs[i];
    int llc2 = ll_code(q.lit_len, &ll_x, &ll_b);
    int mlc2 = ml_code(q.match_len, &ml_x, &ml_b);
    uint32_t ofv2 = q.offset + 3;
    int ofc2 = highbit32(ofv2);
    uint32_t of_x2 = ofv2 - (1u << ofc2);
    sof.encode(bw, ofc2);
    sml.encode(bw, mlc2);
    sll.encode(bw, llc2);
    bw.add(ll_x, ll_b);
    bw.add(ml_x, ml_b);
    bw.add(of_x2, ofc2);
    if (w + bw.pos + 24 > dst_cap) return 0;
  }
  sml.flush(bw);
  sof.flush(bw);
  sll.flush(bw);
  uint64_t bits_len = bw.close();
  w += bits_len;
  if (w >= raw_size) return 0;       // not profitable
  return w;
}

// ---------------------------------------------------------------------------
// public API: compress `src` into ONE complete zstd frame
// ---------------------------------------------------------------------------

static const uint64_t BLOCK_MAX = 128 << 10;

// dst capacity must be >= n + n/8 + 1024.  Returns frame length.
uint64_t naf_zstd_compress(const uint8_t *src, uint64_t n,
                           uint8_t *dst, uint64_t dst_cap,
                           int32_t *scratch_table) {
  // concurrent callers (blocked-section thread pool) each get their own
  // table; the caller-supplied scratch is accepted for ABI compatibility
  static thread_local int32_t tl_table[1 << HLOG];
  (void)scratch_table;
  scratch_table = tl_table;
  fse_init_all();
  uint64_t w = 0;
  // frame header: magic + single-segment descriptor + frame content size
  dst[w++] = 0x28; dst[w++] = 0xB5; dst[w++] = 0x2F; dst[w++] = 0xFD;
  if (n < 256) {
    dst[w++] = 0x20;                          // FCS flag 0, single segment
    dst[w++] = (uint8_t)n;
  } else if (n <= 65535 + 256) {
    dst[w++] = 0x60;                          // FCS flag 1
    uint64_t v = n - 256;
    dst[w++] = (uint8_t)v; dst[w++] = (uint8_t)(v >> 8);
  } else {
    dst[w++] = 0xA0;                          // FCS flag 2 (4 bytes)
    dst[w++] = (uint8_t)n; dst[w++] = (uint8_t)(n >> 8);
    dst[w++] = (uint8_t)(n >> 16); dst[w++] = (uint8_t)(n >> 24);
  }

  MatchCtx ctx{scratch_table};
  std::memset(ctx.table, 0, sizeof(int32_t) << HLOG);

  if (n == 0) {
    // one empty raw last-block
    dst[w++] = 0x01; dst[w++] = 0x00; dst[w++] = 0x00;
    return w;
  }

  // per-block scratch (worst case per 128K block)
  static thread_local Seq seqs[BLOCK_MAX / 4 + 16];
  static thread_local uint8_t literals[BLOCK_MAX + 16];
  static thread_local uint8_t body[BLOCK_MAX + (BLOCK_MAX >> 2) + 4096];

  uint64_t pos = 0;
  while (pos < n) {
    uint64_t bsz = n - pos < BLOCK_MAX ? n - pos : BLOCK_MAX;
    int last = (pos + bsz == n) ? 1 : 0;
    uint32_t lit_n = 0, last_lits = 0;
    uint32_t n_seqs = find_sequences(src, pos, pos + bsz, n, ctx, seqs,
                                     (uint32_t)(BLOCK_MAX / 4), literals,
                                     &lit_n, &last_lits);
    uint64_t bodysz = write_compressed_block(seqs, n_seqs, literals, lit_n,
                                             bsz, body, sizeof(body));
    if (w + 3 + (bodysz ? bodysz : bsz) > dst_cap) return 0;
    if (bodysz) {
      uint32_t hdr = (uint32_t)last | (2u << 1) | ((uint32_t)bodysz << 3);
      dst[w++] = (uint8_t)hdr; dst[w++] = (uint8_t)(hdr >> 8);
      dst[w++] = (uint8_t)(hdr >> 16);
      std::memcpy(dst + w, body, bodysz);
      w += bodysz;
    } else {
      uint32_t hdr = (uint32_t)last | (0u << 1) | ((uint32_t)bsz << 3);
      dst[w++] = (uint8_t)hdr; dst[w++] = (uint8_t)(hdr >> 8);
      dst[w++] = (uint8_t)(hdr >> 16);
      std::memcpy(dst + w, src + pos, bsz);
      w += bsz;
    }
    pos += bsz;
  }
  return w;
}

uint64_t naf_zstd_scratch_bytes(void) { return sizeof(int32_t) << HLOG; }

// ---------------------------------------------------------------------------
// candidate-driven variant: the device kernel (ops/matchfind.py) scores a
// match candidate per position; this serializer verifies, extends, and
// packs — the host side of the device/host split from SURVEY §7 step 6.
// ---------------------------------------------------------------------------

static uint32_t find_sequences_cand(const uint8_t *src, const int32_t *cand,
                                    uint64_t block_start, uint64_t block_end,
                                    Seq *seqs, uint32_t max_seqs,
                                    uint8_t *literals, uint32_t *lit_total,
                                    uint32_t *last_lits) {
  uint64_t pos = block_start, anchor = block_start;
  uint32_t n = 0, lit_n = 0;
  const uint64_t limit = block_end >= 12 ? block_end - 12 : 0;
  while (pos < limit && n < max_seqs) {
    int64_t c = cand[pos];
    if (c >= 0 && pos - (uint64_t)c <= MAXDIST &&
        read32(src + c) == read32(src + pos)) {
      uint64_t m = 4;
      const uint64_t room = block_end - pos;
      while (m < room && src[c + m] == src[pos + m]) m++;
      if (m < 6) { pos++; continue; }
      uint32_t ll = (uint32_t)(pos - anchor);
      std::memcpy(literals + lit_n, src + anchor, ll);
      lit_n += ll;
      seqs[n].lit_len = ll;
      seqs[n].match_len = (uint32_t)m;
      seqs[n].offset = (uint32_t)(pos - (uint64_t)c);
      n++;
      pos += m;
      anchor = pos;
    } else {
      pos++;
    }
  }
  uint32_t tail = (uint32_t)(block_end - anchor);
  std::memcpy(literals + lit_n, src + anchor, tail);
  lit_n += tail;
  *lit_total = lit_n;
  *last_lits = tail;
  return n;
}

uint64_t naf_zstd_compress_cand(const uint8_t *src, uint64_t n,
                                const int32_t *cand,
                                uint8_t *dst, uint64_t dst_cap) {
  fse_init_all();
  uint64_t w = 0;
  dst[w++] = 0x28; dst[w++] = 0xB5; dst[w++] = 0x2F; dst[w++] = 0xFD;
  if (n < 256) {
    dst[w++] = 0x20; dst[w++] = (uint8_t)n;
  } else if (n <= 65535 + 256) {
    dst[w++] = 0x60;
    uint64_t v = n - 256;
    dst[w++] = (uint8_t)v; dst[w++] = (uint8_t)(v >> 8);
  } else {
    dst[w++] = 0xA0;
    dst[w++] = (uint8_t)n; dst[w++] = (uint8_t)(n >> 8);
    dst[w++] = (uint8_t)(n >> 16); dst[w++] = (uint8_t)(n >> 24);
  }
  if (n == 0) {
    dst[w++] = 0x01; dst[w++] = 0x00; dst[w++] = 0x00;
    return w;
  }
  static thread_local Seq seqs[BLOCK_MAX / 4 + 16];
  static thread_local uint8_t literals[BLOCK_MAX + 16];
  static thread_local uint8_t body[BLOCK_MAX + (BLOCK_MAX >> 2) + 4096];
  uint64_t pos = 0;
  while (pos < n) {
    uint64_t bsz = n - pos < BLOCK_MAX ? n - pos : BLOCK_MAX;
    int last = (pos + bsz == n) ? 1 : 0;
    uint32_t lit_n = 0, last_lits = 0;
    uint32_t n_seqs = find_sequences_cand(src, cand, pos, pos + bsz, seqs,
                                          (uint32_t)(BLOCK_MAX / 4),
                                          literals, &lit_n, &last_lits);
    uint64_t bodysz = write_compressed_block(seqs, n_seqs, literals, lit_n,
                                             bsz, body, sizeof(body));
    if (w + 3 + (bodysz ? bodysz : bsz) > dst_cap) return 0;
    if (bodysz) {
      uint32_t hdr = (uint32_t)last | (2u << 1) | ((uint32_t)bodysz << 3);
      dst[w++] = (uint8_t)hdr; dst[w++] = (uint8_t)(hdr >> 8);
      dst[w++] = (uint8_t)(hdr >> 16);
      std::memcpy(dst + w, body, bodysz);
      w += bodysz;
    } else {
      uint32_t hdr = (uint32_t)last | ((uint32_t)bsz << 3);
      dst[w++] = (uint8_t)hdr; dst[w++] = (uint8_t)(hdr >> 8);
      dst[w++] = (uint8_t)(hdr >> 16);
      std::memcpy(dst + w, src + pos, bsz);
      w += bsz;
    }
    pos += bsz;
  }
  return w;
}

}  // extern "C"
