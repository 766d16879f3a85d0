// Multi-stage threaded pipeline executor (header).
//
// Native counterpart of the reference's runtime layer: three nodelets in one
// shared-memory nodelet manager connected by ROS topics with per-nodelet
// callback threads and mutex-guarded deques (SURVEY.md §1 L3). A chain of
// worker threads connected by bounded queues carrying opaque item pointers;
// stage bodies are C function pointers so stages run without the GIL.
#pragma once

#include <condition_variable>
#include <deque>
#include <memory>
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
    // close EVERY queue, not just the front: a stage blocked pushing into a
    // full downstream queue (consumer stopped early) must be woken or the
    // join below deadlocks. Items dropped by a closed push leak — bounded by
    // the queue depths, teardown-only.
    for (auto& q : queues_) q->close();
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
