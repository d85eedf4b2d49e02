// Concurrency stress harness for the hgnn_io prefetching loader.
//
// Built with ThreadSanitizer (`make -C native race-check`) this is the
// framework's race detector for its one genuinely multithreaded native
// component: the thread-pool event loader that replaces the reference's
// 16-process torch DataLoader (reference Modules/utils.py:54,
// Modules/EdgeClassifier/edge_classifier_base.py:41).  The reference gets
// process isolation for free; our in-process workers share the reorder
// buffer, so data races here would corrupt training batches silently.
//
// Scenarios (each also asserts loader SEMANTICS, so the plain -O2 build is
// a determinism test and the TSAN build is a race test):
//   A. Emission order is a pure function of (paths, seed, epoch) --
//      independent of worker count and queue capacity.
//   B. Loop mode emits every event exactly once per epoch, epochs
//      reshuffled deterministically.
//   C. Teardown mid-stream with workers in flight (close-vs-read race).
//   D. Many loaders running concurrently in separate consumer threads.
//   E. Immediate close with zero consumption.
//
// Exit 0 = all scenarios pass.  Under TSAN any detected race exits with
// TSAN_OPTIONS' exitcode (the pytest wrapper sets 66).

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <thread>
#include <vector>

extern "C" {
void* hgnn_loader_open(const char** paths, int n_paths, int queue_capacity,
                       int n_threads, int shuffle_seed, int loop);
void* hgnn_loader_next(void* loader);
void hgnn_loader_close(void* loader);
int hgnn_event_num_arrays(void* ev);
const char* hgnn_event_name(void* ev, int i);
int hgnn_event_ndim(void* ev, int i);
const int64_t* hgnn_event_dims(void* ev, int i);
const void* hgnn_event_data(void* ev, int i);
void hgnn_event_free(void* ev);
int hgnn_write_event(const char* path, int n, const char** names,
                     const int* dtypes, const int* ndims,
                     const int64_t* dims_flat, const void** datas);
}

namespace {

int g_failures = 0;

#define CHECK(cond, msg)                                            \
  do {                                                              \
    if (!(cond)) {                                                  \
      std::fprintf(stderr, "FAIL %s:%d: %s\n", __FILE__, __LINE__,  \
                   msg);                                            \
      ++g_failures;                                                 \
    }                                                               \
  } while (0)

// Writes n_events tiny event files, each carrying an "id" i32 scalar and a
// small float payload, into dir.  Returns the paths.
std::vector<std::string> write_fixture(const std::string& dir, int n_events) {
  std::vector<std::string> paths;
  for (int e = 0; e < n_events; ++e) {
    std::string p = dir + "/ev" + std::to_string(e) + ".hnn";
    int32_t id = e;
    float payload[16];
    for (int i = 0; i < 16; ++i) payload[i] = e * 100.0f + i;
    const char* names[2] = {"id", "x"};
    const int dtypes[2] = {1 /*i32*/, 0 /*f32*/};
    const int ndims[2] = {1, 1};
    const int64_t dims[2] = {1, 16};
    const void* datas[2] = {&id, payload};
    if (hgnn_write_event(p.c_str(), 2, names, dtypes, ndims, dims, datas)) {
      std::fprintf(stderr, "FAIL: cannot write %s\n", p.c_str());
      std::exit(2);
    }
    paths.push_back(std::move(p));
  }
  return paths;
}

int event_id(void* ev) {
  int n = hgnn_event_num_arrays(ev);
  for (int i = 0; i < n; ++i) {
    if (std::strcmp(hgnn_event_name(ev, i), "id") == 0) {
      return *static_cast<const int32_t*>(hgnn_event_data(ev, i));
    }
  }
  return -1;
}

std::vector<int> drain(const std::vector<std::string>& paths, int queue,
                       int threads, int seed, int loop, int take) {
  std::vector<const char*> cps;
  for (auto& p : paths) cps.push_back(p.c_str());
  void* l = hgnn_loader_open(cps.data(), static_cast<int>(cps.size()), queue,
                             threads, seed, loop);
  std::vector<int> ids;
  for (int i = 0; i < take; ++i) {
    void* ev = hgnn_loader_next(l);
    if (!ev) break;
    ids.push_back(event_id(ev));
    hgnn_event_free(ev);
  }
  hgnn_loader_close(l);
  return ids;
}

void scenario_order_determinism(const std::vector<std::string>& paths) {
  const int n = static_cast<int>(paths.size());
  std::vector<int> ref = drain(paths, /*queue=*/2, /*threads=*/1,
                               /*seed=*/7, /*loop=*/0, n);
  CHECK(static_cast<int>(ref.size()) == n, "one-epoch drain short");
  for (int threads : {2, 4, 8}) {
    for (int queue : {1, 3, 16}) {
      std::vector<int> got = drain(paths, queue, threads, 7, 0, n);
      CHECK(got == ref, "emission order depends on worker/queue config");
    }
  }
  // seed -1 = no shuffle: must be file order.
  std::vector<int> plain = drain(paths, 4, 8, -1, 0, n);
  for (int i = 0; i < static_cast<int>(plain.size()); ++i) {
    CHECK(plain[i] == i, "unshuffled order is not file order");
  }
}

void scenario_loop_epochs(const std::vector<std::string>& paths) {
  const int n = static_cast<int>(paths.size());
  const int epochs = 3;
  std::vector<int> a = drain(paths, 3, 8, 13, 1, n * epochs);
  std::vector<int> b = drain(paths, 2, 3, 13, 1, n * epochs);
  CHECK(a == b, "loop-mode order depends on worker/queue config");
  for (int e = 0; e < epochs; ++e) {
    std::vector<int> seen(n, 0);
    for (int i = 0; i < n; ++i) seen[a[e * n + i]]++;
    for (int i = 0; i < n; ++i) {
      CHECK(seen[i] == 1, "epoch is not a permutation of the dataset");
    }
  }
  CHECK(!(std::vector<int>(a.begin(), a.begin() + n) ==
          std::vector<int>(a.begin() + n, a.begin() + 2 * n)),
        "consecutive epochs not reshuffled (seed collision?)");
}

void scenario_teardown_midstream(const std::vector<std::string>& paths) {
  std::vector<const char*> cps;
  for (auto& p : paths) cps.push_back(p.c_str());
  for (int rep = 0; rep < 25; ++rep) {
    void* l = hgnn_loader_open(cps.data(), static_cast<int>(cps.size()),
                               /*queue=*/2, /*threads=*/8, /*seed=*/rep,
                               /*loop=*/1);
    for (int i = 0; i < rep % 4; ++i) {  // 0..3 events, then yank
      void* ev = hgnn_loader_next(l);
      if (ev) hgnn_event_free(ev);
    }
    hgnn_loader_close(l);  // workers still reading ahead
  }
}

void scenario_concurrent_loaders(const std::vector<std::string>& paths) {
  const int n = static_cast<int>(paths.size());
  std::vector<std::thread> ts;
  std::vector<int> ok(4, 0);
  for (int t = 0; t < 4; ++t) {
    ts.emplace_back([&, t] {
      std::vector<int> ids = drain(paths, 2, 4, 100 + t, 1, 2 * n);
      int want = 2 * n;
      ok[t] = static_cast<int>(ids.size()) == want;
    });
  }
  for (auto& t : ts) t.join();
  for (int t = 0; t < 4; ++t) {
    CHECK(ok[t], "concurrent loader lost events");
  }
}

void scenario_close_unconsumed(const std::vector<std::string>& paths) {
  std::vector<const char*> cps;
  for (auto& p : paths) cps.push_back(p.c_str());
  for (int rep = 0; rep < 10; ++rep) {
    void* l = hgnn_loader_open(cps.data(), static_cast<int>(cps.size()), 4, 8,
                               rep, 1);
    hgnn_loader_close(l);
  }
}

}  // namespace

int main(int argc, char** argv) {
  const char* dir = argc > 1 ? argv[1] : "/tmp/hgnn_stress";
  std::string mk = std::string("mkdir -p ") + dir;
  if (std::system(mk.c_str()) != 0) return 2;
  std::vector<std::string> paths = write_fixture(dir, 12);

  scenario_order_determinism(paths);
  scenario_loop_epochs(paths);
  scenario_teardown_midstream(paths);
  scenario_concurrent_loaders(paths);
  scenario_close_unconsumed(paths);

  if (g_failures) {
    std::fprintf(stderr, "hgnn_io_stress: %d failure(s)\n", g_failures);
    return 1;
  }
  std::printf("hgnn_io_stress: all scenarios passed\n");
  return 0;
}
