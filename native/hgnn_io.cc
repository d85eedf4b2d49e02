// hgnn_io: native event serialization + multi-threaded prefetching loader.
//
// The reference feeds training through a torch DataLoader with 16 worker
// processes deserializing pickled PyG events per step (reference
// Modules/utils.py:54, Modules/EdgeClassifier/edge_classifier_base.py:41).
// This library replaces that with a compact binary event format and an
// in-process thread-pool loader: worker threads read+parse event files into
// a bounded ring buffer while the training loop consumes device-ready
// arrays, with per-epoch deterministic reshuffling.
//
// Exposed as a C API consumed from Python via ctypes
// (hierarchicalgnn_tpu/data/native_loader.py).  Build: `make -C native`.

#include <algorithm>
#include <atomic>
#include <chrono>
#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <map>
#include <mutex>
#include <random>
#include <string>
#include <thread>
#include <vector>

namespace {

constexpr uint32_t kMagic = 0x484E4E31;  // "HNN1"

enum DType : uint8_t {
  kF32 = 0,
  kI32 = 1,
  kI64 = 2,
  kU8 = 3,
  kF64 = 4,
};

size_t dtype_size(uint8_t dt) {
  switch (dt) {
    case kF32: return 4;
    case kI32: return 4;
    case kI64: return 8;
    case kU8: return 1;
    case kF64: return 8;
  }
  return 0;
}

struct Array {
  std::string name;
  uint8_t dtype = kF32;
  std::vector<int64_t> dims;
  std::vector<uint8_t> data;

  int64_t num_elements() const {
    int64_t n = 1;
    for (int64_t d : dims) n *= d;
    return n;
  }
};

struct Event {
  std::vector<Array> arrays;
};

bool read_exact(FILE* f, void* dst, size_t n) {
  return fread(dst, 1, n, f) == n;
}

Event* read_event_file(const char* path) {
  FILE* f = fopen(path, "rb");
  if (!f) return nullptr;
  uint32_t magic = 0, n_arrays = 0;
  if (!read_exact(f, &magic, 4) || magic != kMagic ||
      !read_exact(f, &n_arrays, 4) || n_arrays > 1024) {
    fclose(f);
    return nullptr;
  }
  auto ev = new Event();
  ev->arrays.reserve(n_arrays);
  for (uint32_t i = 0; i < n_arrays; ++i) {
    Array a;
    uint8_t name_len = 0, ndim = 0;
    if (!read_exact(f, &name_len, 1)) goto fail;
    a.name.resize(name_len);
    if (!read_exact(f, a.name.data(), name_len)) goto fail;
    if (!read_exact(f, &a.dtype, 1) || !read_exact(f, &ndim, 1)) goto fail;
    a.dims.resize(ndim);
    if (!read_exact(f, a.dims.data(), 8 * ndim)) goto fail;
    {
      size_t bytes = static_cast<size_t>(a.num_elements()) *
                     dtype_size(a.dtype);
      a.data.resize(bytes);
      if (bytes && !read_exact(f, a.data.data(), bytes)) goto fail;
    }
    ev->arrays.push_back(std::move(a));
  }
  fclose(f);
  return ev;
fail:
  fclose(f);
  delete ev;
  return nullptr;
}

struct Loader {
  // Emission is strictly deterministic: event k of the (per-epoch
  // shuffled) order is the k-th item the consumer sees, regardless of
  // which worker finished first -- a bounded reorder window keeps memory
  // in check while threads read ahead.
  std::vector<std::string> paths;
  size_t queue_capacity;
  int shuffle_seed;  // -1: no shuffle
  bool loop;         // reshuffle + continue after each epoch

  std::map<uint64_t, Event*> pending;  // global sequence -> event
  std::mutex mu;
  std::condition_variable not_empty, not_full;
  std::vector<std::thread> workers;
  std::atomic<bool> stop{false};

  // work distribution (global sequence numbers span epochs)
  std::vector<size_t> order;
  uint64_t next_claim = 0;  // next sequence a worker takes
  uint64_t next_emit = 0;   // next sequence the consumer gets
  size_t epoch = 0;

  void reshuffle() {
    order.resize(paths.size());
    for (size_t i = 0; i < order.size(); ++i) order[i] = i;
    if (shuffle_seed >= 0) {
      std::mt19937_64 rng(static_cast<uint64_t>(shuffle_seed) + epoch);
      std::shuffle(order.begin(), order.end(), rng);
    }
  }

  void worker() {
    while (!stop.load()) {
      uint64_t seq;
      std::string path;
      {
        std::unique_lock<std::mutex> lk(mu);
        // read-ahead window clamped to one epoch so at most two epochs'
        // orders are ever live
        size_t window = std::min(queue_capacity, paths.size());
        not_full.wait_for(lk, std::chrono::milliseconds(50), [&] {
          return stop.load() ||
                 (next_claim < next_emit + window &&
                  (loop || next_claim < paths.size()));
        });
        if (stop.load()) return;
        size_t window2 = std::min(queue_capacity, paths.size());
        if (next_claim >= next_emit + window2 ||
            (!loop && next_claim >= paths.size())) {
          continue;
        }
        seq = next_claim++;
        size_t seq_epoch = seq / paths.size();
        if (seq_epoch != epoch) {
          epoch = seq_epoch;
          reshuffle();
        }
        path = paths[order[seq % paths.size()]];  // capture under lock
      }
      Event* ev = read_event_file(path.c_str());
      if (!ev) ev = new Event();  // empty event marks a read failure
      {
        std::unique_lock<std::mutex> lk(mu);
        pending[seq] = ev;
        not_empty.notify_all();
      }
    }
  }

  Event* next() {
    std::unique_lock<std::mutex> lk(mu);
    while (true) {
      if (!loop && next_emit >= paths.size()) return nullptr;
      auto it = pending.find(next_emit);
      if (it != pending.end()) {
        Event* ev = it->second;
        pending.erase(it);
        next_emit++;
        not_full.notify_all();
        return ev;
      }
      not_empty.wait_for(lk, std::chrono::milliseconds(50));
      if (stop.load()) return nullptr;
    }
  }
};

}  // namespace

extern "C" {

void* hgnn_loader_open(const char** paths, int n_paths, int queue_capacity,
                       int n_threads, int shuffle_seed, int loop) {
  auto* l = new Loader();
  l->paths.assign(paths, paths + n_paths);
  l->queue_capacity = queue_capacity > 0 ? queue_capacity : 4;
  l->shuffle_seed = shuffle_seed;
  l->loop = loop != 0;
  l->reshuffle();
  int nt = n_threads > 0 ? n_threads : 4;
  for (int i = 0; i < nt; ++i) l->workers.emplace_back(&Loader::worker, l);
  return l;
}

void* hgnn_loader_next(void* loader) {
  return static_cast<Loader*>(loader)->next();
}

void hgnn_loader_close(void* loader) {
  auto* l = static_cast<Loader*>(loader);
  l->stop.store(true);
  l->not_full.notify_all();
  l->not_empty.notify_all();
  for (auto& t : l->workers) t.join();
  for (auto& kv : l->pending) delete kv.second;
  delete l;
}

int hgnn_event_num_arrays(void* ev) {
  return static_cast<int>(static_cast<Event*>(ev)->arrays.size());
}

const char* hgnn_event_name(void* ev, int i) {
  return static_cast<Event*>(ev)->arrays[i].name.c_str();
}

int hgnn_event_dtype(void* ev, int i) {
  return static_cast<Event*>(ev)->arrays[i].dtype;
}

int hgnn_event_ndim(void* ev, int i) {
  return static_cast<int>(static_cast<Event*>(ev)->arrays[i].dims.size());
}

const int64_t* hgnn_event_dims(void* ev, int i) {
  return static_cast<Event*>(ev)->arrays[i].dims.data();
}

const void* hgnn_event_data(void* ev, int i) {
  return static_cast<Event*>(ev)->arrays[i].data.data();
}

void hgnn_event_free(void* ev) { delete static_cast<Event*>(ev); }

int hgnn_write_event(const char* path, int n, const char** names,
                     const int* dtypes, const int* ndims,
                     const int64_t* dims_flat, const void** datas) {
  FILE* f = fopen(path, "wb");
  if (!f) return -1;
  uint32_t n_arrays = static_cast<uint32_t>(n);
  fwrite(&kMagic, 4, 1, f);
  fwrite(&n_arrays, 4, 1, f);
  const int64_t* dims = dims_flat;
  for (int i = 0; i < n; ++i) {
    uint8_t name_len = static_cast<uint8_t>(strlen(names[i]));
    uint8_t dt = static_cast<uint8_t>(dtypes[i]);
    uint8_t nd = static_cast<uint8_t>(ndims[i]);
    fwrite(&name_len, 1, 1, f);
    fwrite(names[i], 1, name_len, f);
    fwrite(&dt, 1, 1, f);
    fwrite(&nd, 1, 1, f);
    fwrite(dims, 8, nd, f);
    int64_t count = 1;
    for (int d = 0; d < nd; ++d) count *= dims[d];
    fwrite(datas[i], dtype_size(dt), count, f);
    dims += nd;
  }
  fclose(f);
  return 0;
}

}  // extern "C"
