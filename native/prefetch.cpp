// Asynchronous forcing prefetcher — the native get_data analog.
//
// The reference reads forcing snapshots on rank 0 inside the timestep
// loop (ROMS/Nonlinear/get_data.F:102-426), stalling the model on disk
// latency whenever the clock crosses a snapshot boundary.  Here a
// reader thread-pool preads byte ranges (snapshot records of NetCDF/
// npy forcing files) into a bounded ring of host buffers AHEAD of the
// model clock; the Python side (io/forcing.py) asks for record k and
// gets a zero-wait memcpy when the prefetcher has already staged it.
//
// C API (ctypes):
//   void* pf_open(const char* path, long long rec_bytes,
//                 long long first_offset, long long stride,
//                 int n_slots);                     // ring of n_slots
//   int   pf_request(void* h, long long rec);      // schedule read
//   int   pf_ready(void* h, long long rec);        // nonblocking poll
//   int   pf_get(void* h, long long rec, void* out);  // block + copy
//   long long pf_hits(void* h);                    // zero-wait gets
//   long long pf_misses(void* h);                  // blocking gets
//   int   pf_close(void* h);

#include <cstdint>
#include <cstring>
#include <condition_variable>
#include <deque>
#include <fcntl.h>
#include <map>
#include <mutex>
#include <thread>
#include <unistd.h>
#include <vector>

namespace {

struct Slot {
  long long rec = -1;
  bool ready = false;
  std::vector<char> data;
};

struct Prefetcher {
  int fd = -1;
  long long rec_bytes = 0;
  long long first_offset = 0;
  long long stride = 0;
  int n_slots = 0;
  std::vector<Slot> slots;
  std::deque<long long> queue;
  std::mutex mu;
  std::condition_variable cv_work;
  std::condition_variable cv_done;
  std::thread worker;
  bool stop = false;
  long long hits = 0;
  long long misses = 0;

  Slot* find(long long rec) {
    for (auto& s : slots)
      if (s.rec == rec) return &s;
    return nullptr;
  }

  Slot* victim(long long rec) {
    // reuse the slot holding the oldest record (ring semantics)
    Slot* v = &slots[0];
    for (auto& s : slots)
      if (s.rec < v->rec) v = &s;
    v->rec = rec;
    v->ready = false;
    return v;
  }

  void run() {
    std::unique_lock<std::mutex> lk(mu);
    while (true) {
      cv_work.wait(lk, [&] { return stop || !queue.empty(); });
      if (stop) return;
      long long rec = queue.front();
      queue.pop_front();
      Slot* s = find(rec);
      if (s == nullptr) s = victim(rec);
      if (s->ready) continue;              // already staged
      Slot* target = s;
      long long off = first_offset + rec * stride;
      lk.unlock();
      std::vector<char> buf(rec_bytes);
      long long done = 0;
      while (done < rec_bytes) {
        ssize_t n = pread(fd, buf.data() + done, rec_bytes - done,
                          off + done);
        if (n <= 0) break;
        done += n;
      }
      lk.lock();
      target->data.swap(buf);
      target->ready = (done == rec_bytes);
      cv_done.notify_all();
    }
  }
};

}  // namespace

extern "C" {

void* pf_open(const char* path, long long rec_bytes,
              long long first_offset, long long stride, int n_slots) {
  int fd = open(path, O_RDONLY);
  if (fd < 0) return nullptr;
  auto* p = new Prefetcher();
  p->fd = fd;
  p->rec_bytes = rec_bytes;
  p->first_offset = first_offset;
  p->stride = stride;
  p->n_slots = n_slots > 0 ? n_slots : 2;
  p->slots.resize(p->n_slots);
  p->worker = std::thread([p] { p->run(); });
  return p;
}

int pf_request(void* h, long long rec) {
  auto* p = static_cast<Prefetcher*>(h);
  std::lock_guard<std::mutex> lk(p->mu);
  Slot* s = p->find(rec);
  if (s != nullptr && (s->ready || true)) {
    if (s->ready) return 0;                 // staged already
  } else {
    p->victim(rec);
  }
  p->queue.push_back(rec);
  p->cv_work.notify_one();
  return 0;
}

int pf_ready(void* h, long long rec) {
  auto* p = static_cast<Prefetcher*>(h);
  std::lock_guard<std::mutex> lk(p->mu);
  Slot* s = p->find(rec);
  return (s != nullptr && s->ready) ? 1 : 0;
}

int pf_get(void* h, long long rec, void* out) {
  auto* p = static_cast<Prefetcher*>(h);
  std::unique_lock<std::mutex> lk(p->mu);
  Slot* s = p->find(rec);
  if (s == nullptr || !s->ready) {
    if (s == nullptr) {
      p->victim(rec);
      p->queue.push_back(rec);
      p->cv_work.notify_one();
    }
    p->misses++;
    p->cv_done.wait(lk, [&] {
      Slot* t = p->find(rec);
      return t != nullptr && t->ready;
    });
    s = p->find(rec);
  } else {
    p->hits++;
  }
  std::memcpy(out, s->data.data(), p->rec_bytes);
  return 0;
}

long long pf_hits(void* h) {
  auto* p = static_cast<Prefetcher*>(h);
  std::lock_guard<std::mutex> lk(p->mu);
  return p->hits;
}

long long pf_misses(void* h) {
  auto* p = static_cast<Prefetcher*>(h);
  std::lock_guard<std::mutex> lk(p->mu);
  return p->misses;
}

int pf_close(void* h) {
  auto* p = static_cast<Prefetcher*>(h);
  {
    std::lock_guard<std::mutex> lk(p->mu);
    p->stop = true;
    p->cv_work.notify_all();
  }
  p->worker.join();
  close(p->fd);
  delete p;
  return 0;
}

}  // extern "C"
