// Native host-side hot loops for the nmvllm_tpu engine.
//
// The reference keeps its device hot path in CUDA (csrc/) and its host hot
// loops in Python; profiling upstream vLLM shows the host loops —
// per-step batch assembly (worker/model_runner.py:332
// _prepare_model_input_tensors) and prefix-cache block hashing
// (block_manager_v1.py hash_of_block) — bind the engine once device steps
// are fast. This module is the TPU rebuild's native runtime for those
// loops: a persistent per-sequence registry (block tables + lengths live
// in C arrays, updated incrementally as the engine appends tokens/blocks)
// and one-call padded batch assembly writing directly into numpy buffers,
// plus an incremental chained FNV-1a block hasher that replaces the
// O(prefix^2) hash-the-whole-prefix-per-block pattern.
//
// Exposed as a plain C ABI consumed via ctypes (no pybind11 in this
// image). Thread-safety: calls for a given registry must be externally
// serialized (the engine's scheduler/runner are single-threaded by
// design, SURVEY.md §5 "race detection").
#include <cstdint>
#include <cstring>
#include <cstdlib>

extern "C" {

// ---------------------------------------------------------------------------
// Sequence registry
// ---------------------------------------------------------------------------

struct SeqState {
  int32_t *table;      // physical block ids
  int32_t n_blocks;
  int32_t cap_blocks;
  int32_t seq_len;     // tokens in sequence (context length)
  int32_t last_token;
  uint8_t live;
};

struct Registry {
  SeqState *seqs;
  int32_t max_seqs;
};

void *nm_reg_new(int32_t max_seqs) {
  Registry *r = (Registry *)std::calloc(1, sizeof(Registry));
  if (!r) return nullptr;
  r->seqs = (SeqState *)std::calloc((size_t)max_seqs, sizeof(SeqState));
  if (!r->seqs) { std::free(r); return nullptr; }
  r->max_seqs = max_seqs;
  return r;
}

void nm_reg_destroy(void *reg) {
  Registry *r = (Registry *)reg;
  if (!r) return;
  for (int32_t i = 0; i < r->max_seqs; i++) std::free(r->seqs[i].table);
  std::free(r->seqs);
  std::free(r);
}

static int ensure_cap(SeqState *s, int32_t need) {
  if (need <= s->cap_blocks) return 1;
  int32_t cap = s->cap_blocks ? s->cap_blocks : 16;
  while (cap < need) cap *= 2;
  int32_t *t = (int32_t *)std::realloc(s->table, (size_t)cap * 4);
  if (!t) return 0;
  s->table = t;
  s->cap_blocks = cap;
  return 1;
}

// Install/overwrite the full state of a slot (resync path).
int32_t nm_reg_set_seq(void *reg, int32_t slot, int32_t seq_len,
                       int32_t last_token, const int32_t *table,
                       int32_t n_blocks) {
  Registry *r = (Registry *)reg;
  if (slot < 0 || slot >= r->max_seqs) return -1;
  SeqState *s = &r->seqs[slot];
  if (!ensure_cap(s, n_blocks)) return -2;
  std::memcpy(s->table, table, (size_t)n_blocks * 4);
  s->n_blocks = n_blocks;
  s->seq_len = seq_len;
  s->last_token = last_token;
  s->live = 1;
  return 0;
}

// Fast path: one decoded token appended (and, at page boundaries, one
// new physical block).
int32_t nm_reg_append_token(void *reg, int32_t slot, int32_t token,
                            int32_t new_block /* -1 = none */) {
  Registry *r = (Registry *)reg;
  if (slot < 0 || slot >= r->max_seqs || !r->seqs[slot].live) return -1;
  SeqState *s = &r->seqs[slot];
  if (new_block >= 0) {
    if (!ensure_cap(s, s->n_blocks + 1)) return -2;
    s->table[s->n_blocks++] = new_block;
  }
  s->seq_len += 1;
  s->last_token = token;
  return 0;
}

void nm_reg_clear_seq(void *reg, int32_t slot) {
  Registry *r = (Registry *)reg;
  if (slot >= 0 && slot < r->max_seqs) r->seqs[slot].live = 0;
}

// Introspection for the Python-side consistency checks/tests.
int32_t nm_reg_get(void *reg, int32_t slot, int32_t *seq_len,
                   int32_t *last_token, int32_t *n_blocks) {
  Registry *r = (Registry *)reg;
  if (slot < 0 || slot >= r->max_seqs || !r->seqs[slot].live) return -1;
  SeqState *s = &r->seqs[slot];
  *seq_len = s->seq_len;
  *last_token = s->last_token;
  *n_blocks = s->n_blocks;
  return 0;
}

// ---------------------------------------------------------------------------
// Decode batch assembly (worker/runner.py prepare_decode fast path)
// ---------------------------------------------------------------------------
// rows: registry slot per batch row (n entries). Outputs are padded to
// b_pad rows and must be pre-zeroed EXCEPT slots, which this fills with
// -1 for pad rows (matching the Python path's np.full(-1)).
int32_t nm_prepare_decode(void *reg, const int32_t *rows, int32_t n,
                          int32_t b_pad, int32_t block_size,
                          int32_t max_blocks_per_seq, int32_t *tokens,
                          int32_t *positions, int32_t *slots,
                          int32_t *block_tables, int32_t *ctx) {
  Registry *r = (Registry *)reg;
  for (int32_t i = 0; i < n; i++) {
    int32_t slot = rows[i];
    if (slot < 0 || slot >= r->max_seqs || !r->seqs[slot].live) return -1;
    SeqState *s = &r->seqs[slot];
    if (s->n_blocks > max_blocks_per_seq) return -2;
    int32_t pos = s->seq_len - 1;
    int32_t bidx = pos / block_size;
    if (bidx >= s->n_blocks) return -3;
    tokens[i] = s->last_token;
    positions[i] = pos;
    slots[i] = s->table[bidx] * block_size + pos % block_size;
    ctx[i] = s->seq_len;
    std::memcpy(block_tables + (size_t)i * max_blocks_per_seq, s->table,
                (size_t)s->n_blocks * 4);
    std::memset(block_tables + (size_t)i * max_blocks_per_seq + s->n_blocks,
                0, (size_t)(max_blocks_per_seq - s->n_blocks) * 4);
  }
  for (int32_t i = n; i < b_pad; i++) {
    tokens[i] = 0;
    positions[i] = 0;
    slots[i] = -1;
    ctx[i] = 0;
    std::memset(block_tables + (size_t)i * max_blocks_per_seq, 0,
                (size_t)max_blocks_per_seq * 4);
  }
  return 0;
}

// ---------------------------------------------------------------------------
// Prefix-cache chained block hashing
// ---------------------------------------------------------------------------
// Chained FNV-1a 64: hash of block i = fnv(hash of block i-1, tokens of
// block i). Equivalent collision semantics to hashing the whole prefix
// per block (block_manager_v1.py hash_of_block /
// core/block_manager.py:_seq_block_hash) at O(prefix) total instead of
// O(prefix^2). `seed` carries the lora-id salt for block 0 chains.
static inline uint64_t fnv1a_step(uint64_t h, uint64_t v) {
  h ^= v;
  return h * 0x100000001b3ULL;
}

uint64_t nm_hash_block(uint64_t prev_hash, const int32_t *tokens,
                       int32_t n) {
  uint64_t h = fnv1a_step(0xcbf29ce484222325ULL, prev_hash);
  for (int32_t i = 0; i < n; i++)
    h = fnv1a_step(h, (uint64_t)(uint32_t)tokens[i]);
  // Avoid colliding with the allocator's negative placeholder hashes by
  // keeping the sign bit clear (Python receives a non-negative int63).
  return h & 0x7fffffffffffffffULL;
}

void nm_hash_blocks(uint64_t seed, const int32_t *tokens, int32_t n_blocks,
                    int32_t block_size, uint64_t *out) {
  uint64_t h = seed;
  for (int32_t b = 0; b < n_blocks; b++) {
    h = nm_hash_block(h, tokens + (size_t)b * block_size, block_size);
    out[b] = h;
  }
}

}  // extern "C"
