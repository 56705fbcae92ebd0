// Host-side HotSketch — C twin of the device kernels in
// cafe_tpu/sketch/hotsketch.py, exposed through a plain C ABI (ctypes).
//
// Role in this framework (the TPU path never calls this):
//   * fast sequential oracle for large-stream validation of the batched
//     device sketch (tests + cafe_tpu/tools/sketch_bench.py),
//   * host-side frequency/importance pre-scans during offline
//     preprocessing,
//   * binary save/load of sketch state (capability parity with the
//     reference's CAFE+ save_state/load_state).
//
// Semantics follow the single-tier design: S buckets x C cells of
// (id, score, hot-slot), promotion when an id's accumulated score crosses
// the threshold, Space-Saving eviction of the min cell when a bucket is
// full (newcomer inherits the victim's score), global multiplicative decay
// with demotion once total mass exceeds S*threshold*10.

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <vector>

namespace {

constexpr uint32_t kHashMult = 2654435761u;

struct Sketch {
  int buckets = 0;
  int cells = 4;
  float threshold = 0.f;
  float decay = 0.99f;
  double total = 0.0;
  std::vector<int32_t> val;   // [buckets * cells]
  std::vector<float> cnt;
  std::vector<int32_t> dic;
  std::vector<int32_t> free_slots;  // stack
  int free_top = 0;

  int hash(int32_t id) const {
    return static_cast<int>((static_cast<uint32_t>(id) * kHashMult) %
                            static_cast<uint32_t>(buckets));
  }

  void init(int s, float thr, float dr, int c) {
    buckets = s;
    cells = c;
    threshold = thr;
    decay = dr;
    total = 0.0;
    val.assign(static_cast<size_t>(s) * c, 0);
    cnt.assign(static_cast<size_t>(s) * c, 0.f);
    dic.assign(static_cast<size_t>(s) * c, 0);
    free_slots.assign(s, 0);
    for (int i = 0; i < s - 1; ++i) free_slots[i] = i + 1;
    free_top = s - 1;
  }

  void run_decay() {
    for (size_t i = 0; i < cnt.size(); ++i) {
      if (dic[i] != 0 && cnt[i] * decay < threshold) {
        free_slots[free_top++] = dic[i];
        dic[i] = 0;
      }
      cnt[i] *= decay;
    }
    total = 0.0;
  }

  int query(int32_t id) const {
    const size_t base = static_cast<size_t>(hash(id)) * cells;
    for (int i = 0; i < cells; ++i) {
      if (cnt[base + i] > 0.f && val[base + i] == id && dic[base + i] != 0)
        return -dic[base + i];
    }
    return id;
  }

  // returns the newly granted hot slot, or 0
  int insert(int32_t id, float score) {
    total += score;
    const size_t base = static_cast<size_t>(hash(id)) * cells;
    int empty = -1, min_i = 0;
    for (int i = 0; i < cells; ++i) {
      if (cnt[base + i] > 0.f && val[base + i] == id) {
        cnt[base + i] += score;
        if (cnt[base + i] >= threshold && dic[base + i] == 0 &&
            free_top > 0) {
          dic[base + i] = free_slots[--free_top];
          return dic[base + i];
        }
        return 0;
      }
      if (cnt[base + i] <= 0.f && empty < 0) empty = i;
      if (cnt[base + i] < cnt[base + min_i]) min_i = i;
    }
    if (empty >= 0) {
      val[base + empty] = id;
      cnt[base + empty] = score;
      return 0;
    }
    if (dic[base + min_i] == 0) {  // Space-Saving takeover
      val[base + min_i] = id;
      cnt[base + min_i] += score;
    }
    return 0;
  }
};

Sketch* instances[64];

}  // namespace

extern "C" {

void hs_init(int idx, int buckets, float threshold, float decay, int cells) {
  if (!instances[idx]) instances[idx] = new Sketch();
  instances[idx]->init(buckets, threshold, decay, cells);
}

void hs_batch_query(int idx, const int32_t* ids, int n, int32_t* out) {
  Sketch* s = instances[idx];
  for (int i = 0; i < n; ++i) out[i] = s->query(ids[i]);
}

void hs_batch_insert(int idx, const int32_t* ids, const float* scores,
                     int n, int32_t* promoted_slots) {
  Sketch* s = instances[idx];
  if (s->total > static_cast<double>(s->buckets) * s->threshold * 10.0)
    s->run_decay();
  for (int i = 0; i < n; ++i)
    promoted_slots[i] = s->insert(ids[i], scores ? scores[i] : 1.f);
}

int hs_num_hot(int idx) {
  Sketch* s = instances[idx];
  int n = 0;
  for (size_t i = 0; i < s->dic.size(); ++i) n += s->dic[i] != 0;
  return n;
}

// Export all currently hot (id, slot, score) triples; returns count.
int hs_hot_items(int idx, int32_t* ids, int32_t* slots, float* scores,
                 int cap) {
  Sketch* s = instances[idx];
  int n = 0;
  for (size_t i = 0; i < s->dic.size() && n < cap; ++i) {
    if (s->dic[i] != 0) {
      ids[n] = s->val[i];
      slots[n] = s->dic[i];
      scores[n] = s->cnt[i];
      ++n;
    }
  }
  return n;
}

int hs_save_state(int idx, const char* path) {
  Sketch* s = instances[idx];
  FILE* f = fopen(path, "wb");
  if (!f) return -1;
  fwrite(&s->buckets, sizeof(int), 1, f);
  fwrite(&s->cells, sizeof(int), 1, f);
  fwrite(&s->threshold, sizeof(float), 1, f);
  fwrite(&s->decay, sizeof(float), 1, f);
  fwrite(&s->total, sizeof(double), 1, f);
  fwrite(&s->free_top, sizeof(int), 1, f);
  fwrite(s->val.data(), sizeof(int32_t), s->val.size(), f);
  fwrite(s->cnt.data(), sizeof(float), s->cnt.size(), f);
  fwrite(s->dic.data(), sizeof(int32_t), s->dic.size(), f);
  fwrite(s->free_slots.data(), sizeof(int32_t), s->free_slots.size(), f);
  fclose(f);
  return 0;
}

int hs_load_state(int idx, const char* path) {
  if (!instances[idx]) instances[idx] = new Sketch();
  Sketch* s = instances[idx];
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  int buckets = 0, cells = 0;
  if (fread(&buckets, sizeof(int), 1, f) != 1 ||
      fread(&cells, sizeof(int), 1, f) != 1) {
    fclose(f);
    return -2;
  }
  float thr = 0.f, dr = 0.f;
  double tot = 0.0;
  int ft = 0;
  // a truncated/short file must FAIL, not load half-initialized state
  if (fread(&thr, sizeof(float), 1, f) != 1 ||
      fread(&dr, sizeof(float), 1, f) != 1 ||
      fread(&tot, sizeof(double), 1, f) != 1 ||
      fread(&ft, sizeof(int), 1, f) != 1 ||
      buckets <= 0 || cells <= 0 || ft < 0 || ft > buckets - 1) {
    fclose(f);
    return -2;
  }
  s->init(buckets, thr, dr, cells);
  s->total = tot;
  s->free_top = ft;
  if (fread(s->val.data(), sizeof(int32_t), s->val.size(), f) !=
          s->val.size() ||
      fread(s->cnt.data(), sizeof(float), s->cnt.size(), f) !=
          s->cnt.size() ||
      fread(s->dic.data(), sizeof(int32_t), s->dic.size(), f) !=
          s->dic.size() ||
      fread(s->free_slots.data(), sizeof(int32_t), s->free_slots.size(),
            f) != s->free_slots.size()) {
    s->init(buckets, thr, dr, cells);  // wipe the partial load
    fclose(f);
    return -3;
  }
  fclose(f);
  return 0;
}

}  // extern "C"
