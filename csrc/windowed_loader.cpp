// Native windowed-minibatch loader with background prefetch.
//
// The reference feeds KS/Burgers training from a torch DataLoader over a
// windowed Dataset (DistFuncDataset, /root/reference/examples-sinode/KS/
// KS.py:226-255) — a native-backed loader with pinned-memory staging. This
// is the equivalent runtime component for pnode_tpu: given a contiguous
// float32 trajectory array u[N][dim], it assembles shuffled windowed
// minibatches (y0 = u[i], targets = u[i+1 .. i+W]) on a producer thread
// into a ring of staging buffers, so batch assembly overlaps device compute.
//
// Build: part of csrc/Makefile -> ../pnode_tpu/libwindowed_loader.so
// API (ctypes):
//   void* wl_create(const float* data, long n, long dim, long window,
//                   long batch, unsigned long seed, int endpoint_only);
//   long  wl_batches_per_epoch(void* h);
//   // fills y0[batch][dim] and tgt[batch][n_tgt][dim]; returns the epoch
//   // index the batch belongs to (reshuffles between epochs)
//   long  wl_next(void* h, float* y0, float* tgt);
//   void  wl_destroy(void* h);

#include <algorithm>
#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstring>
#include <mutex>
#include <random>
#include <thread>
#include <vector>

namespace {

struct Batch {
  std::vector<float> y0;
  std::vector<float> tgt;
  long epoch;
};

struct Loader {
  const float* data;
  long n, dim, window, batch;
  bool endpoint_only;
  long n_tgt;             // targets per sample (1 if endpoint_only else window)
  long batches_per_epoch;

  std::mt19937_64 rng;
  std::vector<long> starts;
  long cursor = 0;
  long epoch = 0;

  // ring buffer of prefetched batches
  static constexpr int RING = 4;
  Batch ring[RING];
  int head = 0, tail = 0, count = 0;
  std::mutex mu;
  std::condition_variable cv_prod, cv_cons;
  std::atomic<bool> stop{false};
  std::thread producer;

  Loader(const float* d, long n_, long dim_, long w, long b, uint64_t seed,
         bool endpoint)
      : data(d), n(n_), dim(dim_), window(w), batch(b),
        endpoint_only(endpoint), rng(seed) {
    n_tgt = endpoint_only ? 1 : window;
    starts.resize(n - window);
    for (long i = 0; i < (long)starts.size(); ++i) starts[i] = i;
    batches_per_epoch = (long)starts.size() / batch;
    for (auto& slot : ring) {
      slot.y0.resize(batch * dim);
      slot.tgt.resize(batch * n_tgt * dim);
    }
    std::shuffle(starts.begin(), starts.end(), rng);
    producer = std::thread([this] { run(); });
  }

  ~Loader() {
    stop = true;
    cv_prod.notify_all();
    cv_cons.notify_all();
    if (producer.joinable()) producer.join();
  }

  void fill(Batch& out) {
    if (cursor + batch > (long)starts.size() / batch * batch) {
      std::shuffle(starts.begin(), starts.end(), rng);
      cursor = 0;
      ++epoch;
    }
    out.epoch = epoch;
    for (long s = 0; s < batch; ++s) {
      long i = starts[cursor + s];
      std::memcpy(&out.y0[s * dim], &data[i * dim], dim * sizeof(float));
      if (endpoint_only) {
        std::memcpy(&out.tgt[s * dim], &data[(i + window) * dim],
                    dim * sizeof(float));
      } else {
        for (long j = 0; j < window; ++j) {
          std::memcpy(&out.tgt[(s * window + j) * dim],
                      &data[(i + 1 + j) * dim], dim * sizeof(float));
        }
      }
    }
    cursor += batch;
  }

  void run() {
    while (!stop) {
      std::unique_lock<std::mutex> lk(mu);
      cv_prod.wait(lk, [this] { return count < RING || stop; });
      if (stop) return;
      Batch& slot = ring[head];
      lk.unlock();
      fill(slot);  // heavy copy outside the lock
      lk.lock();
      head = (head + 1) % RING;
      ++count;
      cv_cons.notify_one();
    }
  }

  long next(float* y0_out, float* tgt_out) {
    std::unique_lock<std::mutex> lk(mu);
    cv_cons.wait(lk, [this] { return count > 0 || stop; });
    if (stop && count == 0) return -1;
    Batch& slot = ring[tail];
    std::memcpy(y0_out, slot.y0.data(), slot.y0.size() * sizeof(float));
    std::memcpy(tgt_out, slot.tgt.data(), slot.tgt.size() * sizeof(float));
    long ep = slot.epoch;
    tail = (tail + 1) % RING;
    --count;
    cv_prod.notify_one();
    return ep;
  }
};

}  // namespace

extern "C" {

void* wl_create(const float* data, long n, long dim, long window, long batch,
                unsigned long seed, int endpoint_only) {
  if (n - window < batch || batch <= 0) return nullptr;
  return new Loader(data, n, dim, window, batch, seed, endpoint_only != 0);
}

long wl_batches_per_epoch(void* h) {
  return h ? static_cast<Loader*>(h)->batches_per_epoch : 0;
}

long wl_next(void* h, float* y0, float* tgt) {
  return h ? static_cast<Loader*>(h)->next(y0, tgt) : -1;
}

void wl_destroy(void* h) { delete static_cast<Loader*>(h); }

}  // extern "C"
