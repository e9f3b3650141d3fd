// Fast CLIP BPE tokenizer — C++ core with a plain C ABI (loaded via ctypes).
//
// Replaces the host-side hot loop of tokenization (reference
// simple_tokenizer.py:80-126: regex pre-tokenize + greedy lowest-rank merge)
// for training-scale batches (32k captions/step). The Python tokenizer
// remains the reference implementation; this must match it token-for-token
// (tests/test_fast_tokenizer.py).
//
// Design notes:
// * Symbols are vocab ids (int32). A word starts as per-byte ids
//   (non-final / final-with-</w> variants passed in from Python, derived from
//   the byte->unicode table order), and merges are (a, b) -> merged-id with
//   rank, so no string manipulation happens in the merge loop.
// * The pre-tokenizer replicates the reference regex
//   (simple_tokenizer.py:78) as a scanner over codepoints using Unicode
//   category bitmasks (letter / number / whitespace) exported from Python,
//   with alternatives tried in the regex's written order:
//   specials | 's | 't | 're | 've | 'm | 'll | 'd | L+ | N | other+.
//   Input is already normalized (ftfy/html/whitespace/lowercase) in Python.
// * Per-token memoization mirrors the reference's self.cache.

#include <cstdint>
#include <cstring>
#include <mutex>
#include <string>
#include <unordered_map>
#include <vector>

namespace {

struct PairHash {
  size_t operator()(const std::pair<int32_t, int32_t>& p) const {
    return (static_cast<size_t>(p.first) << 21) ^ static_cast<size_t>(p.second);
  }
};

struct Bpe {
  int32_t init_nonfinal[256];
  int32_t init_final[256];
  std::unordered_map<std::pair<int32_t, int32_t>, std::pair<int32_t, int32_t>, PairHash>
      merges;  // (a,b) -> (rank, merged_id)
  const uint8_t* letter_mask;
  const uint8_t* number_mask;
  const uint8_t* space_mask;
  std::vector<uint8_t> masks_copy;  // owns the three masks
  int32_t sot, eot;
  std::unordered_map<std::string, std::vector<int32_t>> cache;
  std::mutex cache_mu;
};

inline bool test_mask(const uint8_t* mask, uint32_t cp) {
  if (cp >= 0x110000u) return false;
  return (mask[cp >> 3] >> (cp & 7)) & 1;
}

// Decode one UTF-8 codepoint at s[i]; advances i. Invalid bytes decode as
// Latin-1 (never happens for Python-produced UTF-8).
inline uint32_t decode_utf8(const unsigned char* s, size_t n, size_t& i) {
  unsigned char c = s[i];
  if (c < 0x80) { i += 1; return c; }
  if ((c >> 5) == 0x6 && i + 1 < n) { uint32_t cp = ((c & 0x1F) << 6) | (s[i + 1] & 0x3F); i += 2; return cp; }
  if ((c >> 4) == 0xE && i + 2 < n) { uint32_t cp = ((c & 0x0F) << 12) | ((s[i + 1] & 0x3F) << 6) | (s[i + 2] & 0x3F); i += 3; return cp; }
  if ((c >> 3) == 0x1E && i + 3 < n) { uint32_t cp = ((c & 0x07) << 18) | ((s[i + 1] & 0x3F) << 12) | ((s[i + 2] & 0x3F) << 6) | (s[i + 3] & 0x3F); i += 4; return cp; }
  i += 1; return c;
}

// Greedy lowest-rank merge loop (simple_tokenizer.py:89-116): find the
// adjacent pair with the smallest rank, merge every occurrence, repeat.
void merge_word(const Bpe& bpe, std::vector<int32_t>& sym) {
  while (sym.size() > 1) {
    int32_t best_rank = INT32_MAX, best_id = -1;
    for (size_t i = 0; i + 1 < sym.size(); ++i) {
      auto it = bpe.merges.find({sym[i], sym[i + 1]});
      if (it != bpe.merges.end() && it->second.first < best_rank) {
        best_rank = it->second.first;
        best_id = it->second.second;
      }
    }
    if (best_id < 0) break;
    // merge every adjacent occurrence of the winning pair in one sweep
    size_t w = 0;
    for (size_t i = 0; i < sym.size();) {
      if (i + 1 < sym.size()) {
        auto it = bpe.merges.find({sym[i], sym[i + 1]});
        if (it != bpe.merges.end() && it->second.first == best_rank) {
          sym[w++] = it->second.second;
          i += 2;
          continue;
        }
      }
      sym[w++] = sym[i++];
    }
    sym.resize(w);
  }
}

void encode_token(Bpe& bpe, const unsigned char* tok, size_t len, std::vector<int32_t>& out) {
  std::string key(reinterpret_cast<const char*>(tok), len);
  {
    // ctypes releases the GIL around bpe_encode_batch and the Bpe handle is
    // a process-wide singleton (text/fast.py), so concurrent callers (e.g.
    // two DataSource prefetch threads) hit this cache in parallel —
    // unordered_map mutation without a lock is UB. Guard both the lookup
    // and the insert; the merge itself runs outside the lock.
    std::lock_guard<std::mutex> g(bpe.cache_mu);
    auto it = bpe.cache.find(key);
    if (it != bpe.cache.end()) {
      out.insert(out.end(), it->second.begin(), it->second.end());
      return;
    }
  }
  std::vector<int32_t> sym;
  sym.reserve(len);
  for (size_t i = 0; i < len; ++i)
    sym.push_back(i + 1 == len ? bpe.init_final[tok[i]] : bpe.init_nonfinal[tok[i]]);
  merge_word(bpe, sym);
  {
    std::lock_guard<std::mutex> g(bpe.cache_mu);
    bpe.cache.emplace(std::move(key), sym);
  }
  out.insert(out.end(), sym.begin(), sym.end());
}

const char kSot[] = "<|startoftext|>";
const char kEot[] = "<|endoftext|>";

inline bool match_lit(const unsigned char* s, size_t n, size_t i, const char* lit, size_t len) {
  return i + len <= n && std::memcmp(s + i, lit, len) == 0;
}

// Pre-tokenize + BPE one normalized UTF-8 text into ids.
void encode_text(Bpe& bpe, const unsigned char* s, size_t n, std::vector<int32_t>& out) {
  static const char* kContractions[] = {"'s", "'t", "'re", "'ve", "'m", "'ll", "'d"};
  size_t i = 0;
  while (i < n) {
    // specials first (regex alternation order, simple_tokenizer.py:78)
    if (match_lit(s, n, i, kSot, sizeof(kSot) - 1)) { out.push_back(bpe.sot); i += sizeof(kSot) - 1; continue; }
    if (match_lit(s, n, i, kEot, sizeof(kEot) - 1)) { out.push_back(bpe.eot); i += sizeof(kEot) - 1; continue; }
    if (s[i] == '\'') {
      bool matched = false;
      for (const char* c : kContractions) {
        size_t len = std::strlen(c);
        if (match_lit(s, n, i, c, len)) {
          encode_token(bpe, s + i, len, out);
          i += len;
          matched = true;
          break;
        }
      }
      if (matched) continue;
    }
    size_t start = i;
    uint32_t cp = decode_utf8(s, n, i);
    if (test_mask(bpe.letter_mask, cp)) {  // [\p{L}]+
      size_t end = i;
      while (end < n) {
        size_t j = end;
        uint32_t c2 = decode_utf8(s, n, j);
        if (!test_mask(bpe.letter_mask, c2)) break;
        end = j;
      }
      encode_token(bpe, s + start, end - start, out);
      i = end;
    } else if (test_mask(bpe.number_mask, cp)) {  // single [\p{N}]
      encode_token(bpe, s + start, i - start, out);
    } else if (test_mask(bpe.space_mask, cp)) {
      // skip whitespace (no token)
    } else {  // [^\s\p{L}\p{N}]+ — greedy; consumes apostrophes too (the
              // contraction alternatives only win when the scan position
              // lands exactly on the apostrophe, matching re.findall).
      size_t end = i;
      while (end < n) {
        size_t j = end;
        uint32_t c2 = decode_utf8(s, n, j);
        if (test_mask(bpe.letter_mask, c2) || test_mask(bpe.number_mask, c2) ||
            test_mask(bpe.space_mask, c2))
          break;
        end = j;
      }
      encode_token(bpe, s + start, end - start, out);
      i = end;
    }
  }
}

}  // namespace

extern "C" {

void* bpe_create(const int32_t* init_nonfinal, const int32_t* init_final, int n_merges,
                 const int32_t* merge_a, const int32_t* merge_b, const int32_t* merge_out,
                 const uint8_t* letter_mask, const uint8_t* number_mask,
                 const uint8_t* space_mask, int32_t sot, int32_t eot) {
  auto* bpe = new Bpe();
  std::memcpy(bpe->init_nonfinal, init_nonfinal, 256 * sizeof(int32_t));
  std::memcpy(bpe->init_final, init_final, 256 * sizeof(int32_t));
  bpe->merges.reserve(n_merges * 2);
  for (int i = 0; i < n_merges; ++i)
    bpe->merges[{merge_a[i], merge_b[i]}] = {i, merge_out[i]};
  const size_t mask_bytes = 0x110000 / 8;
  bpe->masks_copy.resize(mask_bytes * 3);
  std::memcpy(bpe->masks_copy.data(), letter_mask, mask_bytes);
  std::memcpy(bpe->masks_copy.data() + mask_bytes, number_mask, mask_bytes);
  std::memcpy(bpe->masks_copy.data() + 2 * mask_bytes, space_mask, mask_bytes);
  bpe->letter_mask = bpe->masks_copy.data();
  bpe->number_mask = bpe->masks_copy.data() + mask_bytes;
  bpe->space_mask = bpe->masks_copy.data() + 2 * mask_bytes;
  bpe->sot = sot;
  bpe->eot = eot;
  return bpe;
}

void bpe_destroy(void* h) { delete static_cast<Bpe*>(h); }

// Drop the per-word memoization (benchmarking cold-vs-warm; bounded-memory
// hygiene for callers feeding unbounded unique text).
void bpe_clear_cache(void* h) {
  auto* bpe = static_cast<Bpe*>(h);
  std::lock_guard<std::mutex> g(bpe->cache_mu);
  bpe->cache.clear();
}

// Encode a batch of normalized UTF-8 texts (concatenated, with offsets) into
// a zero-padded [n, context_length] int32 matrix with <sot>/<eot> wrapping
// and reference truncation semantics (clip.py:221-238).
// Returns the index of the first too-long text when truncate==0 (error), or
// -1 on success.
int bpe_encode_batch(void* h, const char* buf, const int64_t* offsets, int n,
                     int context_length, int truncate, int32_t* out) {
  auto* bpe = static_cast<Bpe*>(h);
  std::vector<int32_t> ids;
  for (int t = 0; t < n; ++t) {
    ids.clear();
    ids.push_back(bpe->sot);
    encode_text(*bpe, reinterpret_cast<const unsigned char*>(buf) + offsets[t],
                static_cast<size_t>(offsets[t + 1] - offsets[t]), ids);
    ids.push_back(bpe->eot);
    if (static_cast<int>(ids.size()) > context_length) {
      if (!truncate) return t;
      ids.resize(context_length);
      ids[context_length - 1] = bpe->eot;
    }
    int32_t* row = out + static_cast<int64_t>(t) * context_length;
    std::memset(row, 0, context_length * sizeof(int32_t));
    std::memcpy(row, ids.data(), ids.size() * sizeof(int32_t));
  }
  return -1;
}

}  // extern "C"
