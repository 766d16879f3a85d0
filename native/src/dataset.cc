// Radar sequence dataset reader with background prefetch.
//
// Native counterpart of the reference's rosbag replay path (bag_player.py +
// the sensor ingest in the preprocessing nodelet): frames live as packed
// binary ".grf" files (one per scan) in a directory, a C++ thread reads and
// decodes them ahead of the consumer, and the Python driver pops
// ready-to-upload host buffers — IO overlaps device compute without holding
// the GIL.
//
// .grf layout (little endian):
//   magic  uint32 = 0x47524601 ("GRF\1")
//   stamp  float64
//   count  uint32
//   fields uint32 (currently 5: x y z intensity doppler)
//   data   float32[count * fields]

#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <deque>
#include <mutex>
#include <string>
#include <thread>
#include <vector>

namespace gorio {

struct Frame {
  double stamp = 0.0;
  uint32_t count = 0;
  uint32_t fields = 0;
  std::vector<float> data;
  bool ok = false;
};

static bool read_frame(const std::string& path, Frame* out) {
  FILE* f = std::fopen(path.c_str(), "rb");
  if (!f) return false;
  uint32_t magic = 0;
  if (std::fread(&magic, 4, 1, f) != 1 || magic != 0x47524601u) {
    std::fclose(f);
    return false;
  }
  double stamp;
  uint32_t count, fields;
  if (std::fread(&stamp, 8, 1, f) != 1 || std::fread(&count, 4, 1, f) != 1 ||
      std::fread(&fields, 4, 1, f) != 1) {
    std::fclose(f);
    return false;
  }
  out->stamp = stamp;
  out->count = count;
  out->fields = fields;
  out->data.resize(static_cast<size_t>(count) * fields);
  size_t got = std::fread(out->data.data(), 4, out->data.size(), f);
  std::fclose(f);
  out->ok = got == out->data.size();
  return out->ok;
}

class Dataset {
 public:
  Dataset(std::vector<std::string> paths, int queue_depth)
      : paths_(std::move(paths)), depth_(queue_depth > 0 ? queue_depth : 4) {
    worker_ = std::thread([this] { this->run(); });
  }

  ~Dataset() {
    {
      std::lock_guard<std::mutex> lk(mu_);
      stop_ = true;
    }
    cv_space_.notify_all();
    cv_data_.notify_all();
    if (worker_.joinable()) worker_.join();
  }

  // Blocks until the next frame is decoded; returns false at end of sequence.
  bool next(Frame* out) {
    std::unique_lock<std::mutex> lk(mu_);
    cv_data_.wait(lk, [this] { return !queue_.empty() || done_ || stop_; });
    if (queue_.empty()) return false;
    *out = std::move(queue_.front());
    queue_.pop_front();
    cv_space_.notify_one();
    return true;
  }

 private:
  void run() {
    for (const auto& p : paths_) {
      Frame fr;
      read_frame(p, &fr);
      std::unique_lock<std::mutex> lk(mu_);
      cv_space_.wait(lk, [this] { return queue_.size() < static_cast<size_t>(depth_) || stop_; });
      if (stop_) return;
      queue_.push_back(std::move(fr));
      cv_data_.notify_one();
    }
    std::lock_guard<std::mutex> lk(mu_);
    done_ = true;
    cv_data_.notify_all();
  }

  std::vector<std::string> paths_;
  int depth_;
  std::deque<Frame> queue_;
  std::mutex mu_;
  std::condition_variable cv_space_, cv_data_;
  bool done_ = false;
  bool stop_ = false;
  std::thread worker_;
};

}  // namespace gorio

extern "C" {

int gorio_write_frame(const char* path, double stamp, const float* data,
                      uint32_t count, uint32_t fields) {
  FILE* f = std::fopen(path, "wb");
  if (!f) return -1;
  uint32_t magic = 0x47524601u;
  std::fwrite(&magic, 4, 1, f);
  std::fwrite(&stamp, 8, 1, f);
  std::fwrite(&count, 4, 1, f);
  std::fwrite(&fields, 4, 1, f);
  std::fwrite(data, 4, static_cast<size_t>(count) * fields, f);
  std::fclose(f);
  return 0;
}

void* gorio_dataset_open(const char** paths, int n_paths, int queue_depth) {
  std::vector<std::string> ps(paths, paths + n_paths);
  return new gorio::Dataset(std::move(ps), queue_depth);
}

void gorio_dataset_close(void* ds) { delete static_cast<gorio::Dataset*>(ds); }

// Returns count (>0) on success, 0 at end, -1 on decode error; copies at most
// `capacity` rows of `fields` floats into `out` and writes the stamp.
int gorio_dataset_next(void* ds, float* out, uint32_t capacity, uint32_t fields,
                       double* stamp) {
  gorio::Frame fr;
  if (!static_cast<gorio::Dataset*>(ds)->next(&fr)) return 0;
  if (!fr.ok || fr.fields != fields) return -1;
  // A valid frame with zero returns (total sensor dropout) must stay
  // distinguishable from end-of-sequence (0): report -2 so readers can skip.
  if (fr.count == 0) {
    *stamp = fr.stamp;
    return -2;
  }
  uint32_t n = fr.count < capacity ? fr.count : capacity;
  std::memcpy(out, fr.data.data(), static_cast<size_t>(n) * fields * 4);
  *stamp = fr.stamp;
  return static_cast<int>(n);
}

}  // extern "C"
