// tracer: host-side event/span recorder with chrome://tracing export.
//
// Native observability component replacing the reference's scattered
// TimerCUDA prints (`trainer.py:187,213,260,284`,
// `Diffusion_MPC_Inference.py:231-241`): spans are recorded into a
// preallocated ring buffer with nanosecond timestamps and thread ids —
// nanosecond-cheap at record time, no allocation on the hot path — and
// exported as a Chrome Trace Event JSON (chrome://tracing, Perfetto).

#include <atomic>
#include <chrono>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <mutex>
#include <thread>
#include <vector>

namespace {

struct Event {
  char name[48];
  int64_t ts_ns;
  int64_t dur_ns;  // -1 for instant events
  uint32_t tid;
};

struct Tracer {
  std::vector<Event> ring;
  std::atomic<uint64_t> head{0};
  size_t capacity;
};

int64_t now_ns() {
  return std::chrono::duration_cast<std::chrono::nanoseconds>(
             std::chrono::steady_clock::now().time_since_epoch())
      .count();
}

uint32_t tid_hash() {
  return static_cast<uint32_t>(
      std::hash<std::thread::id>{}(std::this_thread::get_id()) & 0xFFFF);
}

}  // namespace

extern "C" {

void* tracer_create(int64_t capacity) {
  Tracer* t = new Tracer();
  t->capacity = static_cast<size_t>(capacity);
  t->ring.resize(t->capacity);
  return t;
}

void tracer_destroy(void* h) { delete static_cast<Tracer*>(h); }

int64_t tracer_now_ns(void*) { return now_ns(); }

// Record a completed span [start_ns, start_ns + dur_ns).
void tracer_span(void* h, const char* name, int64_t start_ns, int64_t dur_ns) {
  Tracer* t = static_cast<Tracer*>(h);
  uint64_t slot = t->head.fetch_add(1, std::memory_order_relaxed) % t->capacity;
  Event& e = t->ring[slot];
  snprintf(e.name, sizeof(e.name), "%s", name);
  e.ts_ns = start_ns;
  e.dur_ns = dur_ns;
  e.tid = tid_hash();
}

// Record an instant event.
void tracer_instant(void* h, const char* name) {
  tracer_span(h, name, now_ns(), -1);
}

int64_t tracer_count(void* h) {
  Tracer* t = static_cast<Tracer*>(h);
  uint64_t n = t->head.load(std::memory_order_relaxed);
  return static_cast<int64_t>(n < t->capacity ? n : t->capacity);
}

// Export to Chrome Trace Event JSON. Returns 0 on success.
int tracer_dump(void* h, const char* path) {
  Tracer* t = static_cast<Tracer*>(h);
  FILE* f = fopen(path, "w");
  if (!f) return -1;
  fprintf(f, "{\"traceEvents\":[\n");
  uint64_t n = t->head.load(std::memory_order_relaxed);
  size_t count = n < t->capacity ? n : t->capacity;
  for (size_t i = 0; i < count; ++i) {
    const Event& e = t->ring[i];
    if (e.dur_ns >= 0) {
      fprintf(f,
              "{\"name\":\"%s\",\"ph\":\"X\",\"ts\":%.3f,\"dur\":%.3f,"
              "\"pid\":1,\"tid\":%u}%s\n",
              e.name, e.ts_ns / 1e3, e.dur_ns / 1e3, e.tid,
              i + 1 < count ? "," : "");
    } else {
      fprintf(f,
              "{\"name\":\"%s\",\"ph\":\"i\",\"ts\":%.3f,\"s\":\"g\","
              "\"pid\":1,\"tid\":%u}%s\n",
              e.name, e.ts_ns / 1e3, e.tid, i + 1 < count ? "," : "");
    }
  }
  fprintf(f, "]}\n");
  fclose(f);
  return 0;
}

}  // extern "C"
