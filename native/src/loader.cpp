// Threaded batch loader — the host-side analog of the reference's
// activation DMA + ping-pong buffering (act_dma.sv feeding act_buffer's
// double bank): worker threads gather, normalize and INT8-quantize
// batches into a bounded ring ahead of the consumer, so the accelerator
// dispatch path never stalls on host preprocessing.
//
// Determinism contract: batch j's contents depend only on (seed, j) —
// epoch e = j / batches_per_epoch uses the Fisher-Yates permutation of
// mt19937_64(seed + e); delivery is strictly in sequence order no
// matter how many workers race.  Trailing samples that do not fill a
// whole batch are dropped (torch DataLoader drop_last semantics).

#include "rat_native.h"

#include <algorithm>
#include <atomic>
#include <cmath>
#include <condition_variable>
#include <cstring>
#include <mutex>
#include <random>
#include <thread>
#include <vector>

namespace {

struct Slot {
  std::vector<int8_t> images;
  std::vector<int32_t> labels;
  int64_t seq = -1;  // which batch this slot currently holds
};

}  // namespace

struct rat_loader {
  // Immutable source (owned copies).
  std::vector<uint8_t> images;
  std::vector<int32_t> labels;
  int64_t n = 0, item_len = 0, batch = 0, channels = 0;
  std::vector<float> mean, stdev;
  float quant_scale = 1.0f;
  bool shuffle = false;
  uint64_t seed = 0;
  int64_t bpe = 0;  // batches per epoch

  // Ring.
  std::vector<Slot> ring;
  std::mutex mu;
  std::condition_variable cv_produced, cv_consumed;
  std::atomic<int64_t> next_to_produce{0};
  int64_t next_to_consume = 0;
  bool stopping = false;
  std::vector<std::thread> workers;

  void permutation(int64_t epoch, std::vector<int64_t>* out) const {
    out->resize(n);
    for (int64_t i = 0; i < n; ++i) (*out)[i] = i;
    if (!shuffle) return;
    std::mt19937_64 rng(seed + static_cast<uint64_t>(epoch));
    for (int64_t i = n - 1; i > 0; --i) {
      std::uniform_int_distribution<int64_t> d(0, i);
      std::swap((*out)[i], (*out)[d(rng)]);
    }
  }

  void produce(int64_t j, Slot* slot, std::vector<int64_t>* perm,
               int64_t* perm_epoch) {
    const int64_t epoch = j / bpe, off = (j % bpe) * batch;
    if (*perm_epoch != epoch) {
      permutation(epoch, perm);
      *perm_epoch = epoch;
    }
    const int64_t inner = item_len / channels;
    for (int64_t b = 0; b < batch; ++b) {
      const int64_t s = (*perm)[off + b];
      const uint8_t* src = images.data() + s * item_len;
      int8_t* dst = slot->images.data() + b * item_len;
      for (int64_t i = 0; i < item_len; ++i) {
        const int64_t c = i / inner;
        const float f =
            ((static_cast<float>(src[i]) / 255.0f) - mean[c]) /
            stdev[c] / quant_scale;
        const float r = std::nearbyint(f);
        dst[i] = static_cast<int8_t>(
            r < -128.0f ? -128 : (r > 127.0f ? 127 : r));
      }
      slot->labels[b] = labels.empty() ? 0 : labels[s];
    }
    slot->seq = j;
  }

  void worker() {
    std::vector<int64_t> perm;
    int64_t perm_epoch = -1;
    Slot local;
    local.images.resize(batch * item_len);
    local.labels.resize(batch);
    const int64_t depth = static_cast<int64_t>(ring.size());
    for (;;) {
      const int64_t j = next_to_produce.fetch_add(1);
      produce(j, &local, &perm, &perm_epoch);
      std::unique_lock<std::mutex> lk(mu);
      Slot& s = ring[j % depth];
      // Admission: the slot must be drained AND it must be this batch's
      // turn for the slot (j within the consumer's window) — otherwise
      // two workers that share j % depth could fill it out of order.
      cv_consumed.wait(lk, [&] {
        return stopping || (s.seq < 0 && j < next_to_consume + depth);
      });
      if (stopping) return;
      s.images.swap(local.images);
      s.labels.swap(local.labels);
      s.seq = j;
      cv_produced.notify_all();
    }
  }

  int64_t next(int8_t* out_images, int32_t* out_labels) {
    std::unique_lock<std::mutex> lk(mu);
    const int64_t j = next_to_consume;
    const int64_t depth = static_cast<int64_t>(ring.size());
    Slot& s = ring[j % depth];
    cv_produced.wait(lk, [&] { return s.seq == j; });
    std::memcpy(out_images, s.images.data(),
                static_cast<size_t>(batch * item_len));
    if (out_labels != nullptr)
      std::memcpy(out_labels, s.labels.data(),
                  static_cast<size_t>(batch) * sizeof(int32_t));
    s.seq = -1;
    ++next_to_consume;
    cv_consumed.notify_all();
    return j;
  }

  ~rat_loader() {
    {
      std::lock_guard<std::mutex> lk(mu);
      stopping = true;
      cv_consumed.notify_all();
      cv_produced.notify_all();
    }
    for (auto& t : workers) t.join();
  }
};

extern "C" {

rat_loader* rat_loader_create(const uint8_t* images, int64_t n,
                              int64_t item_len, const int32_t* labels,
                              int64_t batch, int64_t channels,
                              const float* mean, const float* std_dev,
                              float quant_scale, int shuffle,
                              uint64_t seed, int n_threads, int depth) {
  if (images == nullptr || n <= 0 || item_len <= 0 || batch <= 0 ||
      batch > n || channels <= 0 || item_len % channels != 0 ||
      mean == nullptr || std_dev == nullptr || quant_scale <= 0.0f ||
      !std::isfinite(quant_scale) || n_threads < 1 || depth < 1)
    return nullptr;
  for (int64_t c = 0; c < channels; ++c) {
    // std == 0 would divide to NaN/inf; NaN's int8 cast is UB.
    if (!std::isfinite(mean[c]) || !(std_dev[c] > 0.0f) ||
        !std::isfinite(std_dev[c]))
      return nullptr;
  }
  auto* ld = new rat_loader();
  ld->images.assign(images, images + n * item_len);
  if (labels != nullptr) ld->labels.assign(labels, labels + n);
  ld->n = n;
  ld->item_len = item_len;
  ld->batch = batch;
  ld->channels = channels;
  ld->mean.assign(mean, mean + channels);
  ld->stdev.assign(std_dev, std_dev + channels);
  ld->quant_scale = quant_scale;
  ld->shuffle = shuffle != 0;
  ld->seed = seed;
  ld->bpe = n / batch;
  ld->ring.resize(static_cast<size_t>(depth));
  for (auto& s : ld->ring) {
    s.images.resize(batch * item_len);
    s.labels.resize(batch);
    s.seq = -1;
  }
  for (int t = 0; t < n_threads; ++t)
    ld->workers.emplace_back([ld] { ld->worker(); });
  return ld;
}

int64_t rat_loader_next(rat_loader* ld, int8_t* out_images,
                        int32_t* out_labels) {
  if (ld == nullptr || out_images == nullptr) return -1;
  return ld->next(out_images, out_labels);
}

int64_t rat_loader_batches_per_epoch(const rat_loader* ld) {
  return ld == nullptr ? 0 : ld->bpe;
}

void rat_loader_destroy(rat_loader* ld) { delete ld; }

}  // extern "C"
