// WellPack: native batch-assembly engine for The Well trajectory data.
//
// Design (TPU-native input pipeline, replaces per-window HDF5 reads):
// the Python side decodes + z-score-normalizes each HDF5 split ONCE into a
// flat float32 cache file (trajectories stored contiguously, channels-last
// (T, H, W, C)).  This engine mmaps the cache and assembles training
// batches -- window gather (with dt stride) + copy into page-aligned ring
// buffers -- on a C++ thread pool, fully outside the Python GIL.  A ring of
// K batch slots keeps assembly ahead of the accelerator (prefetch depth),
// so host IO overlaps device compute.
//
// Rationale vs. the reference's loader (data/dataset.py:190-243 +
// torch DataLoader workers): sliding windows overlap T-fold, so per-window
// HDF5 chunk decode repeats work T times; the flat cache makes every window
// a straight memcpy from the OS page cache.
//
// C ABI (consumed via ctypes from tante_tpu/data/wellpack.py):
//   wp_open / wp_close                  mmap the cache file
//   wp_loader_create / wp_loader_destroy
//   wp_loader_next                      -> slot id (blocks), -1 at end
//   wp_loader_buffers                   -> pointers for a slot
//   wp_loader_release                   recycle a slot

#include <atomic>
#include <memory>
#include <condition_variable>
#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <fcntl.h>
#include <mutex>
#include <queue>
#include <sys/mman.h>
#include <sys/stat.h>
#include <thread>
#include <unistd.h>
#include <vector>

namespace {

struct Cache {
  int fd = -1;
  const float* data = nullptr;  // mmapped payload
  size_t bytes = 0;
  int64_t n_traj = 0, T = 0, H = 0, W = 0, C = 0;
  size_t frame_elems() const { return size_t(H) * W * C; }
  size_t traj_elems() const { return size_t(T) * frame_elems(); }
};

constexpr uint64_t kMagic = 0x57454C4C5041434BULL;  // "WELLPACK"

struct Header {
  uint64_t magic;
  int64_t n_traj, T, H, W, C;
};

struct Batch {
  std::vector<float> input;   // (B, t_in, H, W, C)
  std::vector<float> output;  // (B, t_out, H, W, C)
  std::atomic<int> remaining{0};
  int64_t batch_index = -1;
};

struct Loader {
  const Cache* cache = nullptr;
  // Item list: (traj, time) pairs, one per sample, grouped in batches.
  std::vector<int64_t> traj_idx, time_idx;
  int64_t batch_size = 0, t_in = 0, t_out = 0, dt = 1;
  int64_t n_batches = 0;

  std::vector<std::unique_ptr<Batch>> slots;
  std::vector<std::thread> workers;

  // Work queue: (batch_index, slot, item_in_batch)
  struct Task {
    int64_t batch;
    int slot;
    int item;
  };
  std::queue<Task> tasks;
  std::queue<int> free_slots;
  std::queue<std::pair<int64_t, int>> ready;  // (batch_index, slot) in order
  int64_t next_batch_to_schedule = 0;
  int64_t next_batch_to_emit = 0;
  std::mutex mu;
  std::condition_variable cv_task, cv_ready;
  bool stop = false;

  void schedule_locked() {
    while (!free_slots.empty() && next_batch_to_schedule < n_batches) {
      int slot = free_slots.front();
      free_slots.pop();
      int64_t b = next_batch_to_schedule++;
      slots[slot]->batch_index = b;
      slots[slot]->remaining.store(int(batch_size));
      for (int i = 0; i < batch_size; ++i) tasks.push(Task{b, slot, i});
      cv_task.notify_all();
    }
  }

  void fill_item(const Task& t) {
    Batch& s = *slots[t.slot];
    const Cache& c = *cache;
    int64_t item = s.batch_index * batch_size + t.item;
    int64_t traj = traj_idx[item];
    int64_t time = time_idx[item];
    const size_t fe = c.frame_elems();
    const float* src = c.data + size_t(traj) * c.traj_elems();
    float* din = s.input.data() + size_t(t.item) * t_in * fe;
    for (int64_t k = 0; k < t_in; ++k)
      std::memcpy(din + size_t(k) * fe, src + size_t(time + k * dt) * fe,
                  fe * sizeof(float));
    float* dout = s.output.data() + size_t(t.item) * t_out * fe;
    int64_t base = time + t_in * dt;
    for (int64_t k = 0; k < t_out; ++k)
      std::memcpy(dout + size_t(k) * fe, src + size_t(base + k * dt) * fe,
                  fe * sizeof(float));
  }

  void worker() {
    for (;;) {
      Task t;
      {
        std::unique_lock<std::mutex> lk(mu);
        cv_task.wait(lk, [&] { return stop || !tasks.empty(); });
        if (stop) return;
        t = tasks.front();
        tasks.pop();
      }
      fill_item(t);
      if (slots[t.slot]->remaining.fetch_sub(1) == 1) {
        std::lock_guard<std::mutex> lk(mu);
        ready.emplace(slots[t.slot]->batch_index, t.slot);
        cv_ready.notify_all();
      }
    }
  }
};

}  // namespace

extern "C" {

void* wp_open(const char* path) {
  auto* c = new Cache();
  c->fd = ::open(path, O_RDONLY);
  if (c->fd < 0) {
    delete c;
    return nullptr;
  }
  struct stat st;
  if (fstat(c->fd, &st) != 0) {
    ::close(c->fd);
    delete c;
    return nullptr;
  }
  c->bytes = size_t(st.st_size);
  void* m = mmap(nullptr, c->bytes, PROT_READ, MAP_SHARED, c->fd, 0);
  if (m == MAP_FAILED) {
    ::close(c->fd);
    delete c;
    return nullptr;
  }
  const Header* h = reinterpret_cast<const Header*>(m);
  if (h->magic != kMagic) {
    munmap(m, c->bytes);
    ::close(c->fd);
    delete c;
    return nullptr;
  }
  c->n_traj = h->n_traj;
  c->T = h->T;
  c->H = h->H;
  c->W = h->W;
  c->C = h->C;
  c->data = reinterpret_cast<const float*>(reinterpret_cast<const char*>(m) +
                                           sizeof(Header));
  return c;
}

void wp_shape(void* cache, int64_t* out5) {
  auto* c = static_cast<Cache*>(cache);
  out5[0] = c->n_traj;
  out5[1] = c->T;
  out5[2] = c->H;
  out5[3] = c->W;
  out5[4] = c->C;
}

void wp_close(void* cache) {
  auto* c = static_cast<Cache*>(cache);
  if (c->data)
    munmap(const_cast<char*>(reinterpret_cast<const char*>(c->data)) -
               sizeof(Header),
           c->bytes);
  if (c->fd >= 0) ::close(c->fd);
  delete c;
}

void* wp_loader_create(void* cache, const int64_t* traj, const int64_t* time,
                       int64_t n_items, int64_t batch_size, int64_t t_in,
                       int64_t t_out, int64_t dt, int n_threads,
                       int ring_slots) {
  auto* c = static_cast<Cache*>(cache);
  auto* l = new Loader();
  l->cache = c;
  l->batch_size = batch_size;
  l->t_in = t_in;
  l->t_out = t_out;
  l->dt = dt;
  l->n_batches = n_items / batch_size;  // drop_last semantics
  int64_t used = l->n_batches * batch_size;
  l->traj_idx.assign(traj, traj + used);
  l->time_idx.assign(time, time + used);

  const size_t fe = c->frame_elems();
  l->slots.reserve(size_t(ring_slots));
  for (int i = 0; i < ring_slots; ++i) {
    l->slots.emplace_back(new Batch());
    l->slots.back()->input.resize(size_t(batch_size) * t_in * fe);
    l->slots.back()->output.resize(size_t(batch_size) * t_out * fe);
  }
  {
    std::lock_guard<std::mutex> lk(l->mu);
    for (int i = 0; i < ring_slots; ++i) l->free_slots.push(i);
    l->schedule_locked();
  }
  for (int i = 0; i < n_threads; ++i)
    l->workers.emplace_back([l] { l->worker(); });
  return l;
}

// Blocks until the next in-order batch is ready; returns slot id or -1.
int wp_loader_next(void* loader) {
  auto* l = static_cast<Loader*>(loader);
  std::unique_lock<std::mutex> lk(l->mu);
  if (l->next_batch_to_emit >= l->n_batches) return -1;
  int64_t want = l->next_batch_to_emit;
  l->cv_ready.wait(lk, [&] {
    if (l->stop) return true;
    // ready batches may complete out of order; emit in order.
    std::queue<std::pair<int64_t, int>> q = l->ready;
    while (!q.empty()) {
      if (q.front().first == want) return true;
      q.pop();
    }
    return false;
  });
  if (l->stop) return -1;
  // Pop the matching entry (preserve others).
  std::queue<std::pair<int64_t, int>> rest;
  int slot = -1;
  while (!l->ready.empty()) {
    auto e = l->ready.front();
    l->ready.pop();
    if (e.first == want && slot < 0)
      slot = e.second;
    else
      rest.push(e);
  }
  l->ready = std::move(rest);
  l->next_batch_to_emit++;
  return slot;
}

void wp_loader_buffers(void* loader, int slot, float** in_ptr,
                       float** out_ptr) {
  auto* l = static_cast<Loader*>(loader);
  *in_ptr = l->slots[size_t(slot)]->input.data();
  *out_ptr = l->slots[size_t(slot)]->output.data();
}

void wp_loader_release(void* loader, int slot) {
  auto* l = static_cast<Loader*>(loader);
  std::lock_guard<std::mutex> lk(l->mu);
  l->free_slots.push(slot);
  l->schedule_locked();
}

int64_t wp_loader_n_batches(void* loader) {
  return static_cast<Loader*>(loader)->n_batches;
}

void wp_loader_destroy(void* loader) {
  auto* l = static_cast<Loader*>(loader);
  {
    std::lock_guard<std::mutex> lk(l->mu);
    l->stop = true;
  }
  l->cv_task.notify_all();
  l->cv_ready.notify_all();
  for (auto& t : l->workers) t.join();
  delete l;
}

}  // extern "C"
