// Continuous-batching scheduler: the host-side serving loop state machine.
//
// The reference leaves inter-request scheduling to the caller
// (docs/performance.md:139-141); our serving engine builds it in, and this
// module moves the per-token bookkeeping — queue, slot lifecycle, stop-
// condition scanning over decode bursts — out of Python so the engine's
// host loop is O(1) Python work per burst. Bridged via ctypes
// (rten_tpu/generate/native_sched.py) with a pure-Python fallback.
//
// Model: requests are submitted with (id, prompt_len, max_new_tokens,
// stop ids). admit() assigns queued requests to free slots FIFO.
// commit_burst() scans a [steps x max_batch] token matrix produced by the
// on-device decode burst, appends tokens to each live request until a stop
// condition fires, frees finished slots, and reports per-slot accept
// counts + done flags.

#include <cstdint>
#include <deque>
#include <unordered_set>
#include <vector>

namespace {

struct Request {
  int64_t id;
  int32_t prompt_len;
  int32_t max_new_tokens;
  std::unordered_set<int32_t> stop_ids;
  int32_t emitted = 0;   // tokens accepted so far (incl. first from prefill)
  bool done = false;
};

struct Scheduler {
  int32_t max_batch;
  int32_t capacity;
  std::vector<int64_t> slot_request;   // -1 = free
  std::vector<Request> requests;       // indexed by dense handle
  std::deque<int64_t> queue;           // request handles awaiting a slot

  explicit Scheduler(int32_t mb, int32_t cap)
      : max_batch(mb), capacity(cap), slot_request(mb, -1) {}

  Request* by_handle(int64_t h) {
    return (h >= 0 && h < (int64_t)requests.size()) ? &requests[h] : nullptr;
  }
};

}  // namespace

extern "C" {

void* sched_create(int32_t max_batch, int32_t capacity) {
  return new Scheduler(max_batch, capacity);
}

void sched_destroy(void* s) { delete static_cast<Scheduler*>(s); }

// Returns a dense request handle (>= 0), or -1 if the prompt cannot fit.
int64_t sched_submit(void* sp, int32_t prompt_len, int32_t max_new_tokens,
                     const int32_t* stop_ids, int32_t n_stop) {
  auto* s = static_cast<Scheduler*>(sp);
  if (prompt_len >= s->capacity) return -1;
  Request r;
  r.id = (int64_t)s->requests.size();
  r.prompt_len = prompt_len;
  r.max_new_tokens = max_new_tokens;
  for (int32_t i = 0; i < n_stop; i++) r.stop_ids.insert(stop_ids[i]);
  s->requests.push_back(std::move(r));
  s->queue.push_back(s->requests.back().id);
  return s->requests.back().id;
}

// Assign queued requests to free slots. Writes up to max_batch pairs of
// (handle, slot) and returns the count.
int32_t sched_admit(void* sp, int64_t* out_handles, int32_t* out_slots) {
  auto* s = static_cast<Scheduler*>(sp);
  int32_t n = 0;
  for (int32_t slot = 0; slot < s->max_batch && !s->queue.empty(); slot++) {
    if (s->slot_request[slot] != -1) continue;
    int64_t h = s->queue.front();
    s->queue.pop_front();
    s->slot_request[slot] = h;
    out_handles[n] = h;
    out_slots[n] = slot;
    n++;
  }
  return n;
}

// Record the first token of a freshly prefilled request (sampled from the
// prefill logits). May finish the request immediately (stop id, or
// max_new_tokens == 1, or the cache is already at capacity).
// Returns 1 if the request is done (slot freed), else 0.
int32_t sched_commit_first(void* sp, int32_t slot, int32_t token) {
  auto* s = static_cast<Scheduler*>(sp);
  int64_t h = s->slot_request[slot];
  Request* r = s->by_handle(h);
  if (!r) return 0;
  r->emitted = 1;
  if (r->stop_ids.count(token) || r->emitted >= r->max_new_tokens ||
      r->prompt_len + 1 >= s->capacity) {
    r->done = true;
    s->slot_request[slot] = -1;
    return 1;
  }
  return 0;
}

// Scan a burst of decode outputs. tokens: [steps x max_batch] row-major;
// lengths: per-slot sequence depth BEFORE the burst; expected: per-slot
// request handle AT DISPATCH TIME (-1 = slot was idle) — under pipelined
// serving a slot may have been freed and re-admitted between dispatch
// and landing, and the stale burst column must not leak into the new
// request. Writes per-slot accepted-token counts (0 for idle/stale
// slots) and done flags; a request stops accepting at its first stop
// condition. Returns total accepted.
int32_t sched_commit_burst(void* sp, const int32_t* tokens, int32_t steps,
                           const int32_t* lengths, const int64_t* expected,
                           int32_t* out_accepted, uint8_t* out_done) {
  auto* s = static_cast<Scheduler*>(sp);
  int32_t total = 0;
  for (int32_t slot = 0; slot < s->max_batch; slot++) {
    out_accepted[slot] = 0;
    out_done[slot] = 0;
    int64_t h = s->slot_request[slot];
    if (expected != nullptr && h != expected[slot]) continue;
    Request* r = s->by_handle(h);
    if (!r) continue;
    for (int32_t i = 0; i < steps; i++) {
      int32_t tok = tokens[i * s->max_batch + slot];
      r->emitted++;
      out_accepted[slot]++;
      total++;
      if (r->stop_ids.count(tok) || r->emitted >= r->max_new_tokens ||
          lengths[slot] + i + 1 >= s->capacity - 1) {
        r->done = true;
        out_done[slot] = 1;
        s->slot_request[slot] = -1;
        break;
      }
    }
  }
  return total;
}

// Cancel a request wherever it sits: dequeue it if still waiting, free
// its slot if active. Returns 1 if state changed.
int32_t sched_cancel(void* sp, int64_t handle) {
  auto* s = static_cast<Scheduler*>(sp);
  Request* r = s->by_handle(handle);
  if (!r || r->done) return 0;
  r->done = true;
  for (int32_t slot = 0; slot < s->max_batch; slot++) {
    if (s->slot_request[slot] == handle) {
      s->slot_request[slot] = -1;
      return 1;
    }
  }
  for (auto it = s->queue.begin(); it != s->queue.end(); ++it) {
    if (*it == handle) {
      s->queue.erase(it);
      break;
    }
  }
  return 1;
}

int32_t sched_active(void* sp) {
  auto* s = static_cast<Scheduler*>(sp);
  int32_t n = 0;
  for (auto h : s->slot_request) n += (h != -1);
  return n;
}

int32_t sched_queued(void* sp) {
  return (int32_t)static_cast<Scheduler*>(sp)->queue.size();
}

int32_t sched_request_emitted(void* sp, int64_t handle) {
  auto* r = static_cast<Scheduler*>(sp)->by_handle(handle);
  return r ? r->emitted : -1;
}

int32_t sched_request_done(void* sp, int64_t handle) {
  auto* r = static_cast<Scheduler*>(sp)->by_handle(handle);
  return r ? (int32_t)r->done : -1;
}

}  // extern "C"
