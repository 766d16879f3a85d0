// Multi-stage threaded pipeline executor.
//
// Native counterpart of the reference's runtime layer: three nodelets in one
// shared-memory nodelet manager connected by ROS topics with per-nodelet
// callback threads and mutex-guarded deques (SURVEY.md §1 L3). Here the same
// shape is a chain of worker threads connected by bounded queues carrying
// opaque item pointers; stage bodies are C function pointers (the Python
// driver registers C-level trampolines or uses the pipeline for pure native
// stages like IO/decode so the GIL is never held across stages).

#include <condition_variable>
#include <cstdint>
#include <deque>
#include <mutex>
#include <thread>
#include <vector>

namespace gorio {

using StageFn = void* (*)(void* item, void* user);

class BoundedQueue {
 public:
  explicit BoundedQueue(size_t depth) : depth_(depth) {}

  void push(void* v) {
    std::unique_lock<std::mutex> lk(mu_);
    cv_space_.wait(lk, [this] { return q_.size() < depth_ || closed_; });
    if (closed_) return;
    q_.push_back(v);
    cv_data_.notify_one();
  }

  bool pop(void** out) {
    std::unique_lock<std::mutex> lk(mu_);
    cv_data_.wait(lk, [this] { return !q_.empty() || closed_; });
    if (q_.empty()) return false;
    *out = q_.front();
    q_.pop_front();
    cv_space_.notify_one();
    return true;
  }

  void close() {
    std::lock_guard<std::mutex> lk(mu_);
    closed_ = true;
    cv_data_.notify_all();
    cv_space_.notify_all();
  }

  size_t size() {
    std::lock_guard<std::mutex> lk(mu_);
    return q_.size();
  }

 private:
  size_t depth_;
  std::deque<void*> q_;
  std::mutex mu_;
  std::condition_variable cv_data_, cv_space_;
  bool closed_ = false;
};

class Pipeline {
 public:
  Pipeline(const StageFn* fns, void* const* users, int n_stages, int queue_depth) {
    for (int i = 0; i <= n_stages; ++i)
      queues_.emplace_back(new BoundedQueue(queue_depth > 0 ? queue_depth : 4));
    for (int i = 0; i < n_stages; ++i) {
      StageFn fn = fns[i];
      void* user = users[i];
      BoundedQueue* in = queues_[i].get();
      BoundedQueue* out = queues_[i + 1].get();
      workers_.emplace_back([fn, user, in, out] {
        void* item = nullptr;
        while (in->pop(&item)) {
          void* res = fn(item, user);
          if (res) out->push(res);
        }
        out->close();
      });
    }
  }

  ~Pipeline() {
    queues_.front()->close();
    for (auto& w : workers_)
      if (w.joinable()) w.join();
  }

  void push(void* item) { queues_.front()->push(item); }
  void finish() { queues_.front()->close(); }
  bool pop(void** out) { return queues_.back()->pop(out); }
  int backlog(int stage) { return static_cast<int>(queues_[stage]->size()); }

 private:
  std::vector<std::unique_ptr<BoundedQueue>> queues_;
  std::vector<std::thread> workers_;
};

}  // namespace gorio

extern "C" {

void* gorio_pipeline_create(void* const* stage_fns, void* const* users,
                            int n_stages, int queue_depth) {
  return new gorio::Pipeline(reinterpret_cast<const gorio::StageFn*>(stage_fns),
                             users, n_stages, queue_depth);
}

void gorio_pipeline_destroy(void* p) { delete static_cast<gorio::Pipeline*>(p); }
void gorio_pipeline_push(void* p, void* item) {
  static_cast<gorio::Pipeline*>(p)->push(item);
}
void gorio_pipeline_finish(void* p) { static_cast<gorio::Pipeline*>(p)->finish(); }
int gorio_pipeline_pop(void* p, void** out) {
  return static_cast<gorio::Pipeline*>(p)->pop(out) ? 1 : 0;
}
int gorio_pipeline_backlog(void* p, int stage) {
  return static_cast<gorio::Pipeline*>(p)->backlog(stage);
}

}  // extern "C"
