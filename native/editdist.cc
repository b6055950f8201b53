// Batched Levenshtein edit distance over token-id sequences.
//
// Native host-side runtime component: the lip-reading evaluation
// (metrics/lipread.py, reference talking_face/run_av_hubert.py scoring) runs
// O(N*M) dynamic programs per transcript pair; for corpus-scale WER/CER
// sweeps the pure-Python DP dominates evaluation wall-time. This kernel
// scores the whole batch in one serial C loop (one ctypes call per corpus;
// the per-pair DP in optimized C is the entire win — no threading needed at
// transcript scale).
//
// ABI (see dsml_thesis_tpu/metrics/native.py):
//   int64 edit_distance_i32(const int32* a, int64 la, const int32* b, int64 lb)
//   void  edit_distance_batch_i32(const int32* flat_a, const int64* offs_a,
//                                 const int32* flat_b, const int64* offs_b,
//                                 int64 n, int64* out)
// Sequences are concatenated flat arrays with n+1 offsets.

#include <algorithm>
#include <cstdint>
#include <vector>

extern "C" {

int64_t edit_distance_i32(const int32_t* a, int64_t la,
                          const int32_t* b, int64_t lb) {
  if (la == 0) return lb;
  if (lb == 0) return la;
  std::vector<int64_t> prev(lb + 1), cur(lb + 1);
  for (int64_t j = 0; j <= lb; ++j) prev[j] = j;
  for (int64_t i = 1; i <= la; ++i) {
    cur[0] = i;
    const int32_t ai = a[i - 1];
    for (int64_t j = 1; j <= lb; ++j) {
      const int64_t cost = (ai == b[j - 1]) ? 0 : 1;
      cur[j] = std::min({prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + cost});
    }
    std::swap(prev, cur);
  }
  return prev[lb];
}

void edit_distance_batch_i32(const int32_t* flat_a, const int64_t* offs_a,
                             const int32_t* flat_b, const int64_t* offs_b,
                             int64_t n, int64_t* out) {
  for (int64_t k = 0; k < n; ++k) {
    out[k] = edit_distance_i32(flat_a + offs_a[k], offs_a[k + 1] - offs_a[k],
                               flat_b + offs_b[k], offs_b[k + 1] - offs_b[k]);
  }
}

}  // extern "C"
