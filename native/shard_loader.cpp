// Token-shard data loader: mmap'd shards + threaded prefetch.
//
// Native runtime component of muse_maskgit_pytorch_tpu. Plays the role the
// torch DataLoader's C++ worker pool plays for the reference trainer
// (/root/reference/muse_maskgit_pytorch/trainers.py:204-214), specialized for
// the MaskGit training path: datasets of pre-tokenized image sequences
// (int32 token ids, fixed seq_len) stored in binary shards. Shards are
// memory-mapped (zero-copy reads straight from page cache), a seeded
// mt19937_64 drives per-epoch global shuffles, and a background thread pool
// assembles batches into a bounded ring so the accelerator never waits on
// host I/O.
//
// Shard format (little endian):
//   v1 "MUSETOK1": magic(8), int64 num_seqs, int64 seq_len,
//     then num_seqs * seq_len * int32 token ids
//   v2 "MUSETOK2": magic(8), int64 num_seqs, int64 seq_len,
//     int64 grid_h, int64 grid_w (the token grid the leading grid_h*grid_w
//     ids of each row reshape to — aspect-bucketed rectangular training;
//     rows may carry extra trailing ids, e.g. paired super-res cond ids),
//     then num_seqs * seq_len * int32 token ids
//   All shards in one loader must agree on seq_len AND grid (one static
//   shape per compiled train step); v1 shards report grid 0x0 (unknown:
//   consumers fall back to the square isqrt contract).
//
// C ABI (consumed from Python via ctypes — no pybind11 in this toolchain):
//   msl_open(paths, n_paths, batch_size, seed, n_threads, drop_last,
//            skip_batches) -> handle; skip_batches fast-forwards the shuffle
//     stream (epoch wraps + reshuffles replayed from `seed`) BEFORE the
//     prefetch workers start — deterministic mid-epoch resume of the data
//     stream, the role of torchdata's StatefulDataLoader snapshots
//   msl_seq_len(h), msl_num_seqs(h), msl_batches_per_epoch(h)
//   msl_grid_h(h), msl_grid_w(h) -> v2 token-grid metadata (0 for v1 shards)
//   msl_delivered(h) -> batches handed to the consumer since open (the
//     resume token: reopen with skip_batches = this value)
//   msl_epoch(h) -> zero-based shuffle epoch of the NEXT claim
//   msl_next_batch(h, out_ptr) -> rows filled (0 on epoch end error; epochs
//     auto-advance with a reshuffle, so it never returns 0 in practice)
//   msl_next_batch_meta(h, out_ptr, out_shard, out_row) -> same + each
//     row's (shard ordinal, row-in-shard) for joining sidecar metadata
//     (captions) in Python
//   msl_close(h)

#include <algorithm>
#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstring>
#include <deque>
#include <mutex>
#include <numeric>
#include <random>
#include <string>
#include <thread>
#include <vector>

#include <fcntl.h>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>

namespace {

constexpr char kMagicV1[8] = {'M', 'U', 'S', 'E', 'T', 'O', 'K', '1'};
constexpr char kMagicV2[8] = {'M', 'U', 'S', 'E', 'T', 'O', 'K', '2'};

struct Shard {
  const int32_t* data = nullptr;   // token area
  void* map_base = nullptr;
  size_t map_len = 0;
  int64_t num_seqs = 0;
  int64_t seq_len = 0;
  int64_t grid_h = 0;  // v2 token-grid metadata; 0x0 = unknown (v1)
  int64_t grid_w = 0;

  bool open(const char* path) {
    int fd = ::open(path, O_RDONLY);
    if (fd < 0) return false;
    struct stat st;
    if (fstat(fd, &st) != 0 || st.st_size < 24) { ::close(fd); return false; }
    map_len = static_cast<size_t>(st.st_size);
    map_base = mmap(nullptr, map_len, PROT_READ, MAP_PRIVATE, fd, 0);
    ::close(fd);
    if (map_base == MAP_FAILED) { map_base = nullptr; return false; }
    const char* p = static_cast<const char*>(map_base);
    size_t header = 24;
    if (memcmp(p, kMagicV2, 8) == 0) {
      header = 40;
      if (map_len < header) return false;
      memcpy(&grid_h, p + 24, 8);
      memcpy(&grid_w, p + 32, 8);
      if (grid_h <= 0 || grid_w <= 0) return false;
    } else if (memcmp(p, kMagicV1, 8) != 0) {
      return false;
    }
    memcpy(&num_seqs, p + 8, 8);
    memcpy(&seq_len, p + 16, 8);
    if (num_seqs < 0 || seq_len <= 0) return false;
    if (grid_h * grid_w > seq_len) return false;  // grid must fit the row
    size_t need = header + static_cast<size_t>(num_seqs) * seq_len * 4;
    if (need > map_len) return false;
    data = reinterpret_cast<const int32_t*>(p + header);
    madvise(map_base, map_len, MADV_WILLNEED);
    return true;
  }

  void close() {
    if (map_base) munmap(map_base, map_len);
    map_base = nullptr;
  }
};

struct Batch {
  std::vector<int32_t> tokens;
  // provenance of each row (shard ordinal, row within shard): lets the
  // Python side join sidecar per-sequence metadata (e.g. captions for
  // text-conditioned training) without the C++ layer knowing about it
  std::vector<int32_t> shard_idx;
  std::vector<int64_t> row_idx;
  int rows = 0;
};

class ShardLoader {
 public:
  ShardLoader(int batch_size, uint64_t seed, int n_threads, bool drop_last)
      : batch_size_(batch_size),
        drop_last_(drop_last),
        rng_(seed),
        n_threads_(n_threads > 0 ? n_threads : 1) {}

  bool add(const char* path) {
    Shard s;
    if (!s.open(path)) { s.close(); return false; }
    // one loader = one static batch shape: same seq_len and same token grid
    if (!shards_.empty() &&
        (s.seq_len != shards_[0].seq_len || s.grid_h != shards_[0].grid_h ||
         s.grid_w != shards_[0].grid_w)) {
      s.close();
      return false;
    }
    shards_.push_back(s);
    return true;
  }

  bool finalize(int64_t skip_batches) {
    if (shards_.empty()) return false;
    for (size_t i = 0; i < shards_.size(); ++i)
      for (int64_t j = 0; j < shards_[i].num_seqs; ++j)
        index_.push_back({static_cast<int32_t>(i), j});
    if (index_.empty()) return false;
    reshuffle();
    // fast-forward the shuffle stream before any worker claims: replays the
    // exact per-epoch std::shuffle sequence from the ctor seed, so batch
    // skip_batches here is bit-identical to batch skip_batches of a fresh
    // run (delivery ORDER is deterministic for n_threads == 1; with more
    // threads the prefetch ring may reorder, same as a live run)
    if (skip_batches < 0) return false;
    for (int64_t k = 0; k < skip_batches; ++k) advance_cursor();
    delivered_.store(skip_batches);
    stop_.store(false);
    for (int t = 0; t < n_threads_; ++t)
      workers_.emplace_back([this] { worker_loop(); });
    return true;
  }

  int64_t seq_len() const { return shards_[0].seq_len; }
  int64_t grid_h() const { return shards_[0].grid_h; }
  int64_t grid_w() const { return shards_[0].grid_w; }
  int64_t num_seqs() const { return static_cast<int64_t>(index_.size()); }
  int64_t batches_per_epoch() const {
    int64_t n = num_seqs();
    return drop_last_ ? n / batch_size_ : (n + batch_size_ - 1) / batch_size_;
  }

  // Blocks until a prefetched batch is ready; copies into out. out_shard /
  // out_row (optional, length batch_size) receive each row's provenance.
  int next_batch(int32_t* out, int32_t* out_shard = nullptr,
                 int64_t* out_row = nullptr) {
    Batch b;
    {
      std::unique_lock<std::mutex> lk(q_mu_);
      q_cv_.wait(lk, [this] { return !queue_.empty() || stop_.load(); });
      if (queue_.empty()) return 0;
      b = std::move(queue_.front());
      queue_.pop_front();
    }
    q_cv_.notify_all();
    memcpy(out, b.tokens.data(), b.tokens.size() * 4);
    if (out_shard) memcpy(out_shard, b.shard_idx.data(), b.rows * 4);
    if (out_row) memcpy(out_row, b.row_idx.data(), b.rows * 8);
    delivered_.fetch_add(1);
    return b.rows;
  }

  // Resume token: batches handed to the consumer (claimed-but-undelivered
  // prefetch batches are NOT counted — they re-claim after resume, standard
  // at-least-once loader semantics).
  int64_t delivered() const { return delivered_.load(); }
  int64_t epoch() const { return epoch_.load(); }

  void close() {
    stop_.store(true);
    q_cv_.notify_all();
    for (auto& t : workers_) if (t.joinable()) t.join();
    for (auto& s : shards_) s.close();
  }

 private:
  void reshuffle() {
    std::shuffle(index_.begin(), index_.end(), rng_);
    cursor_.store(0);
  }

  // Advance the epoch cursor by one batch, wrapping + reshuffling at epoch
  // end; returns the claimed [begin, begin+take) range. Callers: claim()
  // under epoch_mu_, and finalize()'s fast-forward (single-threaded, before
  // workers exist) — both must go through here so a resumed stream replays
  // the identical wrap/reshuffle sequence.
  std::pair<int64_t, int64_t> advance_cursor() {
    int64_t n = num_seqs();
    int64_t c = cursor_.load();
    if (c >= n || (drop_last_ && c + batch_size_ > n)) {
      epoch_++;
      reshuffle();
      c = 0;
    }
    int64_t take = std::min<int64_t>(batch_size_, n - c);
    cursor_.store(c + take);
    return {c, take};
  }

  // Claim the next batch's index entries; the (shard, row) pairs are
  // SNAPSHOTTED under epoch_mu_ — an epoch-wrap reshuffle() std::shuffles
  // index_ in place, so reading index_ after releasing the lock could tear
  // pairs mid-shuffle (UB / out-of-bounds rows). Epoch wrap itself also
  // happens here, so exactly one thread reshuffles.
  bool claim(std::vector<std::pair<int32_t, int64_t>>* entries) {
    std::lock_guard<std::mutex> lk(epoch_mu_);
    auto [c, take] = advance_cursor();
    entries->assign(index_.begin() + c, index_.begin() + c + take);
    return true;
  }

  void worker_loop() {
    const int64_t L = seq_len();
    while (!stop_.load()) {
      {
        std::unique_lock<std::mutex> lk(q_mu_);
        q_cv_.wait(lk, [this] {
          return queue_.size() < kMaxQueue || stop_.load();
        });
        if (stop_.load()) return;
      }
      std::vector<std::pair<int32_t, int64_t>> entries;
      claim(&entries);
      const int rows = static_cast<int>(entries.size());
      Batch b;
      b.rows = rows;
      b.tokens.assign(static_cast<size_t>(batch_size_) * L, 0);
      b.shard_idx.resize(rows);
      b.row_idx.resize(rows);
      for (int r = 0; r < rows; ++r) {
        auto [si, sj] = entries[r];
        const Shard& s = shards_[si];
        memcpy(b.tokens.data() + static_cast<size_t>(r) * L,
               s.data + sj * L, L * 4);
        b.shard_idx[r] = si;
        b.row_idx[r] = sj;
      }
      {
        std::lock_guard<std::mutex> lk(q_mu_);
        queue_.push_back(std::move(b));
      }
      q_cv_.notify_all();
    }
  }

  static constexpr size_t kMaxQueue = 8;

  int batch_size_;
  bool drop_last_;
  std::mt19937_64 rng_;
  int n_threads_;
  std::vector<Shard> shards_;
  std::vector<std::pair<int32_t, int64_t>> index_;
  std::atomic<int64_t> cursor_{0};
  std::atomic<int64_t> delivered_{0};
  std::atomic<int64_t> epoch_{0};
  std::mutex epoch_mu_;

  std::deque<Batch> queue_;
  std::mutex q_mu_;
  std::condition_variable q_cv_;
  std::atomic<bool> stop_{true};
  std::vector<std::thread> workers_;
};

}  // namespace

extern "C" {

void* msl_open(const char** paths, int n_paths, int batch_size, uint64_t seed,
               int n_threads, int drop_last, int64_t skip_batches) {
  if (n_paths <= 0 || batch_size <= 0) return nullptr;
  auto* loader = new ShardLoader(batch_size, seed, n_threads, drop_last != 0);
  for (int i = 0; i < n_paths; ++i) {
    if (!loader->add(paths[i])) {
      loader->close();
      delete loader;
      return nullptr;
    }
  }
  if (!loader->finalize(skip_batches)) {
    loader->close();
    delete loader;
    return nullptr;
  }
  return loader;
}

int64_t msl_seq_len(void* h) { return static_cast<ShardLoader*>(h)->seq_len(); }
int64_t msl_grid_h(void* h) { return static_cast<ShardLoader*>(h)->grid_h(); }
int64_t msl_grid_w(void* h) { return static_cast<ShardLoader*>(h)->grid_w(); }
int64_t msl_num_seqs(void* h) { return static_cast<ShardLoader*>(h)->num_seqs(); }
int64_t msl_batches_per_epoch(void* h) {
  return static_cast<ShardLoader*>(h)->batches_per_epoch();
}

int msl_next_batch(void* h, int32_t* out) {
  return static_cast<ShardLoader*>(h)->next_batch(out);
}

int msl_next_batch_meta(void* h, int32_t* out, int32_t* out_shard,
                        int64_t* out_row) {
  return static_cast<ShardLoader*>(h)->next_batch(out, out_shard, out_row);
}

int64_t msl_delivered(void* h) {
  return static_cast<ShardLoader*>(h)->delivered();
}

int64_t msl_epoch(void* h) { return static_cast<ShardLoader*>(h)->epoch(); }

void msl_close(void* h) {
  auto* loader = static_cast<ShardLoader*>(h);
  loader->close();
  delete loader;
}

}  // extern "C"
