// Native multithreaded frame loader for raw RGB24 video streams.
//
// The reference's data path is MoviePy's ffmpeg subprocess pipe feeding one
// frame at a time into Python (process_video.py:42-44) — decode, a pipe
// copy, and the GIL all serialize with compute. This loader is the
// framework's native-runtime replacement for the hot serving path: a
// background reader thread streams fixed-size frame chunks from disk into a
// ring of preallocated buffers while the device consumes the previous
// chunk, exposed to Python over a minimal ctypes C ABI (zero-copy
// acquire/release).
//
// Format: a flat file of back-to-back RGB24 frames (width*height*3 bytes
// per frame); geometry travels in a sidecar JSON (see
// lane_tracker_tpu/io/native_loader.py).
//
// Build: make -C native   (produces liblt_frameloader.so)

#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <mutex>
#include <thread>
#include <vector>

namespace {

struct Chunk {
  std::vector<uint8_t> data;
  int n_valid = 0;       // frames actually read (tail chunks)
  bool ready = false;    // filled by the reader, not yet consumed
  bool consumed = true;  // free for the reader to refill
};

struct Loader {
  FILE* file = nullptr;
  size_t frame_bytes = 0;
  int chunk_frames = 0;
  std::vector<Chunk> ring;
  size_t head = 0;  // next slot the reader fills
  size_t tail = 0;  // next slot the consumer takes
  bool eof = false;
  bool stop = false;
  int acquired = -1;  // slot currently held by the consumer, -1 if none
  std::mutex mu;
  std::condition_variable cv_reader;
  std::condition_variable cv_consumer;
  std::thread reader;
};

void reader_main(Loader* L) {
  for (;;) {
    Chunk* slot = nullptr;
    size_t idx = 0;
    {
      std::unique_lock<std::mutex> lock(L->mu);
      L->cv_reader.wait(lock, [&] {
        return L->stop || L->ring[L->head % L->ring.size()].consumed;
      });
      if (L->stop) return;
      idx = L->head % L->ring.size();
      slot = &L->ring[idx];
      slot->consumed = false;
      L->head++;
    }
    // Read outside the lock: this is the overlap with device compute.
    size_t want = L->frame_bytes * L->chunk_frames;
    size_t got = fread(slot->data.data(), 1, want, L->file);
    int frames = static_cast<int>(got / L->frame_bytes);
    // Pad a short tail by repeating the last full frame so consumers
    // always see a static chunk shape.
    if (frames > 0 && frames < L->chunk_frames) {
      const uint8_t* last = slot->data.data() + (frames - 1) * L->frame_bytes;
      for (int f = frames; f < L->chunk_frames; ++f) {
        std::memcpy(slot->data.data() + f * L->frame_bytes, last,
                    L->frame_bytes);
      }
    }
    {
      std::lock_guard<std::mutex> lock(L->mu);
      slot->n_valid = frames;
      slot->ready = true;
      if (frames < L->chunk_frames) L->eof = true;
      L->cv_consumer.notify_all();
      if (L->eof) return;
    }
  }
}

}  // namespace

extern "C" {

// Opens `path` (flat RGB24 frames). Returns nullptr on failure.
void* lt_loader_open(const char* path, int width, int height, int chunk_frames,
                     int n_buffers) {
  if (width <= 0 || height <= 0 || chunk_frames <= 0 || n_buffers < 2)
    return nullptr;
  FILE* f = fopen(path, "rb");
  if (!f) return nullptr;
  auto* L = new Loader();
  L->file = f;
  L->frame_bytes = static_cast<size_t>(width) * height * 3;
  L->chunk_frames = chunk_frames;
  L->ring.resize(n_buffers);
  for (auto& c : L->ring) c.data.resize(L->frame_bytes * chunk_frames);
  L->reader = std::thread(reader_main, L);
  return L;
}

// Blocks until the next chunk is ready; returns a pointer to the chunk's
// bytes (chunk_frames*H*W*3, tail-padded) and writes the number of valid
// frames to *n_valid. Returns nullptr at end of stream. The pointer stays
// valid until the next lt_loader_acquire / lt_loader_close.
const uint8_t* lt_loader_acquire(void* handle, int* n_valid) {
  auto* L = static_cast<Loader*>(handle);
  std::unique_lock<std::mutex> lock(L->mu);
  // Release the previously acquired slot back to the reader.
  if (L->acquired >= 0) {
    L->ring[L->acquired].ready = false;
    L->ring[L->acquired].consumed = true;
    L->acquired = -1;
    L->cv_reader.notify_all();
  }
  size_t idx = L->tail % L->ring.size();
  L->cv_consumer.wait(lock, [&] {
    return L->ring[idx].ready || (L->eof && !L->ring[idx].ready) || L->stop;
  });
  Chunk& c = L->ring[idx];
  if (!c.ready || c.n_valid == 0) {
    if (n_valid) *n_valid = 0;
    return nullptr;
  }
  L->tail++;
  L->acquired = static_cast<int>(idx);
  if (n_valid) *n_valid = c.n_valid;
  return c.data.data();
}

void lt_loader_close(void* handle) {
  auto* L = static_cast<Loader*>(handle);
  {
    std::lock_guard<std::mutex> lock(L->mu);
    L->stop = true;
    L->cv_reader.notify_all();
    L->cv_consumer.notify_all();
  }
  if (L->reader.joinable()) L->reader.join();
  fclose(L->file);
  delete L;
}

}  // extern "C"
