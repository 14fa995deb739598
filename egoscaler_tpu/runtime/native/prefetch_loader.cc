// Threaded prefetching file loader for the training data pipeline.
//
// The reference feeds its trainer through torch DataLoader worker
// processes (train.py:72-82) and extracts frames under a
// ThreadPoolExecutor (4_get_image.py:112-133).  On TPU hosts the input
// pipeline must keep the chip fed without stealing the Python thread, so
// this C++ pool reads files (npy/pkl/jpg bytes) ahead of consumption
// into reusable buffers; Python drains via ctypes (runtime/loader.py)
// and hands decoded arrays straight to jax.device_put.
//
// API (C, ctypes-friendly):
//   void* pfl_create(const char** paths, int n, int threads, int depth);
//   long  pfl_next(void* h, int* index_out, char** data_out);  // blocks
//   void  pfl_release(void* h, char* data);                    // recycle
//   void  pfl_destroy(void* h);
//
// pfl_next returns the byte length (or -1 when exhausted) and the file's
// position in the original path list, so ordering-sensitive consumers
// can reassemble batches.

#include <condition_variable>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <deque>
#include <mutex>
#include <string>
#include <thread>
#include <vector>

namespace {

struct Item {
  int index;
  long size;
  char* data;
};

struct Loader {
  std::vector<std::string> paths;
  std::deque<Item> ready;
  std::mutex mu;
  std::condition_variable cv_ready;
  std::condition_variable cv_space;
  size_t next_path = 0;
  size_t emitted = 0;
  int depth;
  bool stop = false;
  std::vector<std::thread> workers;

  void worker() {
    for (;;) {
      size_t idx;
      {
        std::unique_lock<std::mutex> lk(mu);
        if (stop || next_path >= paths.size()) return;
        idx = next_path++;
      }
      FILE* f = fopen(paths[idx].c_str(), "rb");
      long size = -1;
      char* data = nullptr;
      if (f) {
        fseek(f, 0, SEEK_END);
        size = ftell(f);
        fseek(f, 0, SEEK_SET);
        data = static_cast<char*>(malloc(size > 0 ? size : 1));
        if (data && size > 0 && fread(data, 1, size, f) != (size_t)size) {
          free(data);
          data = nullptr;
          size = -1;
        }
        fclose(f);
      }
      {
        std::unique_lock<std::mutex> lk(mu);
        cv_space.wait(lk, [&] {
          return stop || (int)ready.size() < depth;
        });
        if (stop) {
          free(data);
          return;
        }
        ready.push_back(Item{(int)idx, size, data});
        cv_ready.notify_one();
      }
    }
  }
};

}  // namespace

extern "C" {

void* pfl_create(const char** paths, int n, int threads, int depth) {
  auto* l = new Loader();
  l->paths.reserve(n);
  for (int i = 0; i < n; ++i) l->paths.emplace_back(paths[i]);
  l->depth = depth > 0 ? depth : 4;
  int t = threads > 0 ? threads : 2;
  for (int i = 0; i < t; ++i) {
    l->workers.emplace_back([l] { l->worker(); });
  }
  return l;
}

long pfl_next(void* h, int* index_out, char** data_out) {
  auto* l = static_cast<Loader*>(h);
  std::unique_lock<std::mutex> lk(l->mu);
  l->cv_ready.wait(lk, [&] {
    return !l->ready.empty() || l->emitted >= l->paths.size();
  });
  if (l->ready.empty()) return -1;  // exhausted
  Item it = l->ready.front();
  l->ready.pop_front();
  l->emitted++;
  l->cv_space.notify_one();
  *index_out = it.index;
  *data_out = it.data;
  return it.size;
}

void pfl_release(void* h, char* data) {
  (void)h;
  free(data);
}

void pfl_destroy(void* h) {
  auto* l = static_cast<Loader*>(h);
  {
    std::unique_lock<std::mutex> lk(l->mu);
    l->stop = true;
    l->cv_space.notify_all();
    l->cv_ready.notify_all();
  }
  for (auto& w : l->workers) w.join();
  for (auto& it : l->ready) free(it.data);
  delete l;
}

}  // extern "C"
