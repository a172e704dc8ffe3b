// Asynchronous record sink for the output streams.
//
// The reference writes history records synchronously on rank 0
// (ROMS/Utility/wrt_his.F -> nf_fwrite*), stalling the timestep loop on
// disk latency.  Here the Python writer computes classic-NetCDF record
// offsets (the format's record section is a fixed-stride array, so
// appending needs no format logic) and hands (offset, bytes) jobs to
// this sink; a worker thread copies the payload and pwrite()s it while
// the model keeps stepping.  numrecs (big-endian u32 at byte 4) is
// patched on flush.
//
// C API (ctypes):
//   void* sink_open(const char* path);
//   int   sink_write(void* h, long long offset, const void* buf,
//                    long long size);          // enqueues a copy
//   int   sink_set_numrecs(void* h, unsigned n);
//   int   sink_flush(void* h);                 // drain queue + fsync
//   int   sink_close(void* h);
//   long long sink_pending(void* h);           // queued bytes

#include <cstdint>
#include <cstring>
#include <condition_variable>
#include <deque>
#include <fcntl.h>
#include <mutex>
#include <thread>
#include <unistd.h>
#include <vector>

namespace {

struct Job {
  long long offset;
  std::vector<char> data;
};

struct Sink {
  int fd = -1;
  std::thread worker;
  std::mutex mu;
  std::condition_variable cv;       // signals worker: work or stop
  std::condition_variable cv_done;  // signals flushers: queue drained
  std::deque<Job> queue;
  long long pending_bytes = 0;
  bool stop = false;
  bool io_error = false;

  void run() {
    std::unique_lock<std::mutex> lk(mu);
    for (;;) {
      cv.wait(lk, [&] { return stop || !queue.empty(); });
      if (queue.empty()) {
        if (stop) return;
        continue;
      }
      Job job = std::move(queue.front());
      queue.pop_front();
      lk.unlock();
      long long off = job.offset;
      const char* p = job.data.data();
      long long left = (long long)job.data.size();
      while (left > 0) {
        ssize_t n = ::pwrite(fd, p, (size_t)left, (off_t)off);
        if (n <= 0) { io_error = true; break; }
        p += n; off += n; left -= n;
      }
      lk.lock();
      pending_bytes -= (long long)job.data.size();
      if (queue.empty()) cv_done.notify_all();
    }
  }
};

}  // namespace

extern "C" {

void* sink_open(const char* path) {
  Sink* s = new Sink();
  s->fd = ::open(path, O_WRONLY, 0644);
  if (s->fd < 0) { delete s; return nullptr; }
  s->worker = std::thread([s] { s->run(); });
  return s;
}

int sink_write(void* h, long long offset, const void* buf,
               long long size) {
  Sink* s = static_cast<Sink*>(h);
  if (!s || s->io_error || size < 0) return -1;
  Job job;
  job.offset = offset;
  job.data.assign(static_cast<const char*>(buf),
                  static_cast<const char*>(buf) + size);
  {
    std::lock_guard<std::mutex> lk(s->mu);
    s->pending_bytes += size;
    s->queue.push_back(std::move(job));
  }
  s->cv.notify_one();
  return 0;
}

int sink_set_numrecs(void* h, unsigned n) {
  // classic NetCDF: numrecs is a big-endian u32 at byte offset 4
  unsigned char be[4] = {
      (unsigned char)(n >> 24), (unsigned char)(n >> 16),
      (unsigned char)(n >> 8), (unsigned char)n};
  return sink_write(h, 4, be, 4);
}

int sink_flush(void* h) {
  Sink* s = static_cast<Sink*>(h);
  if (!s) return -1;
  {
    std::unique_lock<std::mutex> lk(s->mu);
    s->cv_done.wait(lk, [&] { return s->queue.empty(); });
  }
  ::fsync(s->fd);
  return s->io_error ? -1 : 0;
}

long long sink_pending(void* h) {
  Sink* s = static_cast<Sink*>(h);
  std::lock_guard<std::mutex> lk(s->mu);
  return s->pending_bytes;
}

int sink_close(void* h) {
  Sink* s = static_cast<Sink*>(h);
  if (!s) return -1;
  {
    std::lock_guard<std::mutex> lk(s->mu);
    s->stop = true;
  }
  s->cv.notify_all();
  s->worker.join();
  ::fsync(s->fd);
  ::close(s->fd);
  int err = s->io_error ? -1 : 0;
  delete s;
  return err;
}

}  // extern "C"
