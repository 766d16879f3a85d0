// C API over the generic multi-stage pipeline (see pipeline.h) plus the
// concrete decode->pack dataset pipeline the slam CLI ingests through.
//
// Reference role: the 3-nodelet shared-manager runtime (SURVEY.md §1 L3) —
// sensor decode and host packing run in native threads that never hold the
// GIL, overlapping with the Python driver's device dispatch.

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <vector>

#include "pipeline.h"

namespace gorio {

// ---- .grf frame decode (shared with dataset.cc's reader) -------------------

struct PFrame {
  double stamp = 0.0;
  uint32_t count = 0;
  uint32_t fields = 0;
  std::vector<float> data;
  bool ok = false;
};

static bool pread_frame(const std::string& path, PFrame* out) {
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

// ---- decode -> pack dataset pipeline ---------------------------------------

struct PackedItem {
  double stamp = 0.0;
  int n = 0;  // valid points (<= capacity); -1 marks a decode error
  std::vector<float> padded;  // (capacity * fields), zero-padded
};

struct DatasetPipeline {
  Pipeline* pipe = nullptr;
  std::thread feeder;
  std::vector<std::string> paths;
  int capacity = 0;
  int fields = 0;

  ~DatasetPipeline() {
    delete pipe;  // closes queues; worker threads join
    if (feeder.joinable()) feeder.join();
  }
};

// stage 0: path string -> decoded PFrame
static void* stage_decode(void* item, void*) {
  std::string* path = static_cast<std::string*>(item);
  PFrame* fr = new PFrame();
  bool ok = pread_frame(*path, fr);
  delete path;
  if (!ok) fr->ok = false;
  return fr;
}

// stage 1: PFrame -> zero-padded (capacity, fields) host buffer ready for
// device upload (the pack the CLI's fused path previously did in Python)
static void* stage_pack(void* item, void* user) {
  DatasetPipeline* dp = static_cast<DatasetPipeline*>(user);
  PFrame* fr = static_cast<PFrame*>(item);
  PackedItem* out = new PackedItem();
  out->stamp = fr->stamp;
  out->padded.assign(static_cast<size_t>(dp->capacity) * dp->fields, 0.0f);
  if (!fr->ok) {
    out->n = -1;
  } else {
    int n = static_cast<int>(fr->count);
    if (n > dp->capacity) n = dp->capacity;
    int fcopy = static_cast<int>(fr->fields) < dp->fields
                    ? static_cast<int>(fr->fields)
                    : dp->fields;
    for (int i = 0; i < n; ++i)
      std::memcpy(&out->padded[static_cast<size_t>(i) * dp->fields],
                  &fr->data[static_cast<size_t>(i) * fr->fields],
                  sizeof(float) * fcopy);
    out->n = n;
  }
  delete fr;
  return out;
}

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

// ---- dataset pipeline C API -------------------------------------------------

void* gorio_pipeline_dataset_open(const char* const* paths, int n_paths,
                                  int queue_depth, int capacity, int fields) {
  auto* dp = new gorio::DatasetPipeline();
  dp->capacity = capacity;
  dp->fields = fields;
  dp->paths.reserve(n_paths);
  for (int i = 0; i < n_paths; ++i) dp->paths.emplace_back(paths[i]);
  gorio::StageFn fns[2] = {gorio::stage_decode, gorio::stage_pack};
  void* users[2] = {nullptr, dp};
  dp->pipe = new gorio::Pipeline(fns, users, 2, queue_depth);
  dp->feeder = std::thread([dp] {
    for (const auto& p : dp->paths) dp->pipe->push(new std::string(p));
    dp->pipe->finish();
  });
  return dp;
}

// Pops the next packed frame into `out` (capacity * fields floats).
// Returns the valid point count, 0 at end of sequence, -1 on a corrupt
// frame, -2 for a valid frame with zero returns (sensor dropout).
int gorio_pipeline_dataset_next(void* h, float* out, double* stamp) {
  auto* dp = static_cast<gorio::DatasetPipeline*>(h);
  void* item = nullptr;
  if (!dp->pipe->pop(&item)) return 0;
  auto* pk = static_cast<gorio::PackedItem*>(item);
  std::memcpy(out, pk->padded.data(), pk->padded.size() * sizeof(float));
  *stamp = pk->stamp;
  int n = pk->n;
  delete pk;
  return n == 0 ? -2 : n;
}

int gorio_pipeline_dataset_backlog(void* h, int stage) {
  return static_cast<gorio::DatasetPipeline*>(h)->pipe->backlog(stage);
}

void gorio_pipeline_dataset_close(void* h) {
  delete static_cast<gorio::DatasetPipeline*>(h);
}

}  // extern "C"
