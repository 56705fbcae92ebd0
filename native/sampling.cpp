// BPR negative sampling (C ABI / ctypes).
//
// Host-side companion to cafe_tpu/models/graphrec/sampling.py — the same
// role as the reference's pybind11 sampler
// (TOIS_revision/LightGCN/code/sources/sampling.cpp): per user emit
// train_num/user_num (user, pos, neg...) rows with uniform negatives
// rejection-sampled against the user's positive set. Positive sets arrive
// flattened (CSR-style offsets) since ctypes cannot pass vector<vector>.

#include <cstdint>
#include <cstdlib>
#include <random>

extern "C" {

// pos_items: concatenated positive item ids per user
// pos_offsets: [user_num + 1] CSR offsets into pos_items
// out: [rows * (2 + neg_num)] with rows = user_num * (train_num/user_num)
// returns number of rows written
int bpr_sample(int user_num, int item_num, int train_num,
               const int32_t* pos_items, const int64_t* pos_offsets,
               int neg_num, uint64_t seed, int32_t* out) {
  if (user_num <= 0 || item_num <= 0) return 0;
  std::mt19937_64 rng(seed);
  const int per_user = train_num / user_num > 0 ? train_num / user_num : 1;
  const int row_w = 2 + neg_num;
  int r = 0;
  for (int u = 0; u < user_num; ++u) {
    const int64_t lo = pos_offsets[u], hi = pos_offsets[u + 1];
    const int64_t npos = hi - lo;
    if (npos == 0) continue;  // cold-start users have nothing to train on
    for (int k = 0; k < per_user; ++k) {
      int32_t* row = out + static_cast<int64_t>(r) * row_w;
      row[0] = u;
      row[1] = pos_items[lo + static_cast<int64_t>(rng() % npos)];
      for (int j = 0; j < neg_num; ++j) {
        int32_t neg;
        bool clash;
        do {
          neg = static_cast<int32_t>(rng() % item_num);
          clash = false;
          for (int64_t t = lo; t < hi; ++t) {
            if (pos_items[t] == neg) {
              clash = true;
              break;
            }
          }
        } while (clash && npos < item_num);
        row[2 + j] = neg;
      }
      ++r;
    }
  }
  return r;
}

}  // extern "C"
