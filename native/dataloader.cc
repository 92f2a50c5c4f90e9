// Native tokenized-dataset loader — the framework's C++ data path.
//
// Role: the host-side input pipeline for LM training (the component the
// round brief lists alongside the bench runner as "native runtime"; the
// reference repo has no data loading at all, so this is beyond-reference
// surface built to the same standard as native/pjrt_bench.cc).
//
// Design:
// - Token shards are flat binary files of little-endian uint16/uint32
//   tokens with a 16-byte header (magic "LTPU", u32 token_bytes, u64
//   count). They are mmap'd read-only: the OS page cache IS the shard
//   cache, shared across processes, no user-space copy until batch
//   assembly.
// - A worker thread assembles (batch, seq_len+1) int32 batches by random
//   crops over the concatenated shard space (standard LM sampling) into a
//   fixed ring of slots (depth = prefetch). The consumer (Python via
//   ctypes, holding no GIL during the blocking wait) overlaps host batch
//   assembly with TPU steps — the cudaStream-prefetch analog for input.
// - Determinism: crop offsets come from splitmix64(seed, step); a loader
//   re-opened with the same (paths, seed, shapes) replays the same stream,
//   which is what checkpoint/resume needs (pass the restored step as
//   start_step).
//
// C ABI (ctypes-friendly), all functions return 0/-1 or a handle:
//   dl_open(paths, n_paths, seq_len, batch, prefetch, seed, start_step)
//   dl_next(h, int32* out)        -> step index (>=0), blocks; -1 on error
//   dl_total_tokens(h)            -> u64 token count across shards
//   dl_close(h)
//
// Build: make -C native libdataloader.so

#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <mutex>
#include <thread>
#include <vector>

#include <fcntl.h>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>

namespace {

constexpr char kMagic[4] = {'L', 'T', 'P', 'U'};

struct Shard {
  const uint8_t* base = nullptr;   // mmap base (incl. header)
  size_t map_len = 0;
  uint32_t token_bytes = 0;
  uint64_t count = 0;              // tokens in this shard
  uint64_t first = 0;              // global index of this shard's token 0

  const uint8_t* tokens() const { return base + 16; }
};

inline uint64_t splitmix64(uint64_t x) {
  x += 0x9e3779b97f4a7c15ull;
  x = (x ^ (x >> 30)) * 0xbf58476d1ce4e5b9ull;
  x = (x ^ (x >> 27)) * 0x94d049bb133111ebull;
  return x ^ (x >> 31);
}

struct Loader {
  std::vector<Shard> shards;
  uint64_t total = 0;              // total tokens
  int64_t seq_len = 0;             // tokens per row is seq_len + 1
  int64_t batch = 0;
  uint64_t seed = 0;

  // prefetch ring
  int depth = 0;
  std::vector<std::vector<int32_t>> slots;
  std::vector<int64_t> slot_step;       // step held by each slot, -1 empty
  int64_t next_fill = 0;                // next step the worker assembles
  int64_t next_take = 0;                // next step the consumer reads
  std::mutex mu;
  std::condition_variable cv_fill, cv_take;
  std::atomic<bool> stop{false};
  std::thread worker;

  int64_t row_tokens() const { return seq_len + 1; }

  // global token index -> value (shards are contiguous in global space)
  int32_t token_at(uint64_t g) const {
    // linear shard scan: shard counts are few (files), crops are sequential
    // within one shard almost always — find once per row below instead.
    for (const Shard& s : shards) {
      if (g < s.first + s.count) {
        uint64_t i = g - s.first;
        if (s.token_bytes == 2) {
          uint16_t v;
          std::memcpy(&v, s.tokens() + 2 * i, 2);
          return static_cast<int32_t>(v);
        }
        uint32_t v;
        std::memcpy(&v, s.tokens() + 4 * i, 4);
        return static_cast<int32_t>(v);
      }
    }
    return 0;  // unreachable for valid g
  }

  void fill_row(uint64_t step, int64_t row, int32_t* dst) const {
    // crop start in [0, total - row_tokens], never spanning shard ends is
    // NOT required: token_at handles the (rare) boundary-crossing row.
    uint64_t r = splitmix64(seed * 0x100000001b3ull + step * 1315423911ull +
                            static_cast<uint64_t>(row));
    uint64_t start = r % (total - static_cast<uint64_t>(row_tokens()));
    // fast path: whole row inside one shard -> bulk convert
    for (const Shard& s : shards) {
      if (start >= s.first &&
          start + row_tokens() <= s.first + s.count) {
        uint64_t i = start - s.first;
        if (s.token_bytes == 2) {
          const uint8_t* p = s.tokens() + 2 * i;
          for (int64_t t = 0; t < row_tokens(); ++t) {
            uint16_t v;
            std::memcpy(&v, p + 2 * t, 2);
            dst[t] = v;
          }
        } else {
          const uint8_t* p = s.tokens() + 4 * i;
          for (int64_t t = 0; t < row_tokens(); ++t) {
            uint32_t v;
            std::memcpy(&v, p + 4 * t, 4);
            dst[t] = static_cast<int32_t>(v);
          }
        }
        return;
      }
    }
    for (int64_t t = 0; t < row_tokens(); ++t)  // boundary-crossing row
      dst[t] = token_at(start + static_cast<uint64_t>(t));
  }

  void fill_batch(uint64_t step, int32_t* dst) const {
    for (int64_t b = 0; b < batch; ++b)
      fill_row(step, b, dst + b * row_tokens());
  }

  void run() {
    for (;;) {
      std::unique_lock<std::mutex> lk(mu);
      cv_fill.wait(lk, [&] {
        return stop.load() || next_fill < next_take + depth;
      });
      if (stop.load()) return;
      int64_t step = next_fill;
      int slot = static_cast<int>(step % depth);
      lk.unlock();
      fill_batch(static_cast<uint64_t>(step), slots[slot].data());
      lk.lock();
      slot_step[slot] = step;
      next_fill = step + 1;
      cv_take.notify_all();
    }
  }
};

bool map_shard(const char* path, Shard* out) {
  int fd = open(path, O_RDONLY);
  if (fd < 0) return false;
  struct stat st;
  if (fstat(fd, &st) != 0 || st.st_size < 16) {
    close(fd);
    return false;
  }
  void* p = mmap(nullptr, static_cast<size_t>(st.st_size), PROT_READ,
                 MAP_PRIVATE, fd, 0);
  close(fd);
  if (p == MAP_FAILED) return false;
  const uint8_t* b = static_cast<const uint8_t*>(p);
  if (std::memcmp(b, kMagic, 4) != 0) {
    munmap(p, static_cast<size_t>(st.st_size));
    return false;
  }
  uint32_t tb;
  uint64_t count;
  std::memcpy(&tb, b + 4, 4);
  std::memcpy(&count, b + 8, 8);
  if ((tb != 2 && tb != 4) ||
      16 + tb * count > static_cast<uint64_t>(st.st_size)) {
    munmap(p, static_cast<size_t>(st.st_size));
    return false;
  }
  out->base = b;
  out->map_len = static_cast<size_t>(st.st_size);
  out->token_bytes = tb;
  out->count = count;
  return true;
}

}  // namespace

extern "C" {

void* dl_open(const char** paths, int n_paths, long long seq_len,
              long long batch, int prefetch, unsigned long long seed,
              long long start_step) {
  if (n_paths <= 0 || seq_len <= 0 || batch <= 0 || prefetch <= 0)
    return nullptr;
  auto* L = new Loader();
  uint64_t first = 0;
  for (int i = 0; i < n_paths; ++i) {
    Shard s;
    if (!map_shard(paths[i], &s)) {
      std::fprintf(stderr, "dataloader: bad shard %s\n", paths[i]);
      for (auto& m : L->shards)  // unmap everything mapped so far
        munmap(const_cast<uint8_t*>(m.base), m.map_len);
      delete L;
      return nullptr;
    }
    s.first = first;
    first += s.count;
    L->shards.push_back(s);
  }
  L->total = first;
  L->seq_len = seq_len;
  L->batch = batch;
  L->seed = seed;
  if (L->total < static_cast<uint64_t>(seq_len + 1) + 1) {
    std::fprintf(stderr, "dataloader: %llu tokens < seq_len+1\n",
                 static_cast<unsigned long long>(L->total));
    for (auto& s : L->shards)
      munmap(const_cast<uint8_t*>(s.base), s.map_len);
    delete L;
    return nullptr;
  }
  L->depth = prefetch;
  L->slots.assign(prefetch, std::vector<int32_t>(
                                static_cast<size_t>(batch * (seq_len + 1))));
  L->slot_step.assign(prefetch, -1);
  L->next_fill = start_step;
  L->next_take = start_step;
  L->worker = std::thread([L] { L->run(); });
  return L;
}

long long dl_next(void* h, int32_t* out) {
  auto* L = static_cast<Loader*>(h);
  if (!L) return -1;
  std::unique_lock<std::mutex> lk(L->mu);
  int64_t step = L->next_take;
  int slot = static_cast<int>(step % L->depth);
  L->cv_take.wait(lk, [&] { return L->slot_step[slot] == step; });
  std::memcpy(out, L->slots[slot].data(),
              L->slots[slot].size() * sizeof(int32_t));
  L->slot_step[slot] = -1;
  L->next_take = step + 1;
  L->cv_fill.notify_all();
  return step;
}

unsigned long long dl_total_tokens(void* h) {
  auto* L = static_cast<Loader*>(h);
  return L ? L->total : 0;
}

void dl_close(void* h) {
  auto* L = static_cast<Loader*>(h);
  if (!L) return;
  {
    std::lock_guard<std::mutex> lk(L->mu);
    L->stop.store(true);
  }
  L->cv_fill.notify_all();
  if (L->worker.joinable()) L->worker.join();
  for (auto& s : L->shards)
    munmap(const_cast<uint8_t*>(s.base), s.map_len);
  delete L;
}

}  // extern "C"
