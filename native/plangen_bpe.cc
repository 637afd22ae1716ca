// Byte-level BPE encode engine (native replacement for the reference's
// Rust `tokenizers` dependency — SURVEY.md Table B).
//
// Scope: the merge loop, which is the hot part of BPE encoding. The host
// Python layer (plangen_tpu/text/bpe_native.py) parses tokenizer.json,
// resolves merge rules to id triples, performs GPT-2 pre-tokenization and
// added-special-token splitting, and calls bpe_encode once per pre-token.
//
// Build: make -C native   (produces libplangen_bpe.so, loaded via ctypes)

#include <cstdint>
#include <cstring>
#include <unordered_map>
#include <vector>

namespace {

struct Bpe {
  // (left_id << 32 | right_id) -> (rank, merged_id)
  std::unordered_map<uint64_t, std::pair<int32_t, int32_t>> merges;
  int32_t byte_init[256];  // byte value -> initial token id
};

inline uint64_t pair_key(int32_t l, int32_t r) {
  return (static_cast<uint64_t>(static_cast<uint32_t>(l)) << 32) |
         static_cast<uint32_t>(r);
}

}  // namespace

extern "C" {

// byte_init: 256 entries, initial token id per byte value.
// merges: n_merges triples (left_id, right_id, merged_id) in RANK ORDER
// (index == rank; lower rank merges first).
void* bpe_create(const int32_t* byte_init, const int32_t* merges,
                 int32_t n_merges) {
  auto* b = new Bpe();
  std::memcpy(b->byte_init, byte_init, 256 * sizeof(int32_t));
  b->merges.reserve(static_cast<size_t>(n_merges) * 2);
  for (int32_t i = 0; i < n_merges; ++i) {
    const int32_t l = merges[3 * i], r = merges[3 * i + 1],
                  m = merges[3 * i + 2];
    // first rule for a pair wins (matches HF: ranks are unique per pair)
    b->merges.emplace(pair_key(l, r), std::make_pair(i, m));
  }
  return b;
}

void bpe_free(void* h) { delete static_cast<Bpe*>(h); }

// Encode ONE pre-token (raw bytes) into token ids. Returns the number of
// ids written, or -1 if out_cap is too small.
int32_t bpe_encode(void* h, const uint8_t* data, int32_t len, int32_t* out,
                   int32_t out_cap) {
  const Bpe* b = static_cast<const Bpe*>(h);
  std::vector<int32_t> toks;
  toks.reserve(len);
  for (int32_t i = 0; i < len; ++i) toks.push_back(b->byte_init[data[i]]);

  // classic greedy loop: repeatedly apply the lowest-rank adjacent merge.
  // Pre-tokens are short (a word / number / punctuation run), so the
  // O(n * applied) scan beats heap bookkeeping in practice.
  while (toks.size() >= 2) {
    int best_rank = INT32_MAX, best_pos = -1, best_id = -1;
    for (size_t i = 0; i + 1 < toks.size(); ++i) {
      auto it = b->merges.find(pair_key(toks[i], toks[i + 1]));
      if (it != b->merges.end() && it->second.first < best_rank) {
        best_rank = it->second.first;
        best_pos = static_cast<int>(i);
        best_id = it->second.second;
      }
    }
    if (best_pos < 0) break;
    toks[best_pos] = best_id;
    toks.erase(toks.begin() + best_pos + 1);
  }

  if (static_cast<int32_t>(toks.size()) > out_cap) return -1;
  std::memcpy(out, toks.data(), toks.size() * sizeof(int32_t));
  return static_cast<int32_t>(toks.size());
}

}  // extern "C"
