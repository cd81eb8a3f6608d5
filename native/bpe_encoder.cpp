// Native BPE merge loop.
//
// The tokenizer hot path for serving: given a pre-tokenized word as a
// sequence of symbol ids, repeatedly merge the lowest-rank adjacent pair
// until no merge applies. The Python layer owns vocab/regex/byte-level
// mapping; this C++ core replaces the O(n²) Python merge scan
// (rten_tpu/text/bpe.py::_bpe_word) for long words / large batches —
// the analog of the reference's native rten-text crate.
//
// C ABI:
//   handle = bpe_create(n_merges, left_ids[], right_ids[], merged_ids[])
//     — merge table: rank i merges (left_ids[i], right_ids[i]) into
//       merged_ids[i]. Symbol ids are arbitrary ints (Python interns
//       token strings to ids).
//   n_out = bpe_apply(handle, ids[], n_in, out[], cap)
//     — applies merges in rank order; returns output length.
//   bpe_destroy(handle)

#include <cstdint>
#include <cstring>
#include <unordered_map>
#include <vector>

namespace {

struct PairHash {
  size_t operator()(const std::pair<int32_t, int32_t>& p) const {
    return std::hash<uint64_t>()(
        (static_cast<uint64_t>(static_cast<uint32_t>(p.first)) << 32) |
        static_cast<uint32_t>(p.second));
  }
};

struct Bpe {
  // (left, right) -> (rank, merged)
  std::unordered_map<std::pair<int32_t, int32_t>,
                     std::pair<int32_t, int32_t>, PairHash>
      merges;
};

}  // namespace

extern "C" {

void* bpe_create(int32_t n, const int32_t* left, const int32_t* right,
                 const int32_t* merged) {
  Bpe* bpe = new Bpe();
  bpe->merges.reserve(n * 2);
  for (int32_t i = 0; i < n; i++) {
    bpe->merges.emplace(std::make_pair(left[i], right[i]),
                        std::make_pair(i, merged[i]));
  }
  return bpe;
}

int32_t bpe_apply(void* handle, const int32_t* ids, int32_t n_in,
                  int32_t* out, int32_t cap) {
  Bpe* bpe = static_cast<Bpe*>(handle);
  std::vector<int32_t> buf(ids, ids + n_in);
  while (buf.size() > 1) {
    int32_t best_rank = INT32_MAX;
    size_t best_i = SIZE_MAX;
    int32_t best_merged = -1;
    for (size_t i = 0; i + 1 < buf.size(); i++) {
      auto it = bpe->merges.find({buf[i], buf[i + 1]});
      if (it != bpe->merges.end() && it->second.first < best_rank) {
        best_rank = it->second.first;
        best_i = i;
        best_merged = it->second.second;
      }
    }
    if (best_i == SIZE_MAX) break;
    buf[best_i] = best_merged;
    buf.erase(buf.begin() + best_i + 1);
  }
  int32_t n_out = static_cast<int32_t>(buf.size());
  if (n_out > cap) return -n_out;  // caller retries with a bigger buffer
  std::memcpy(out, buf.data(), n_out * sizeof(int32_t));
  return n_out;
}

void bpe_destroy(void* handle) { delete static_cast<Bpe*>(handle); }

}  // extern "C"
