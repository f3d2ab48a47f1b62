// Continuous-batching scheduler core (C++).
//
// The host-side hot loop of a serving deployment: between device steps the
// runtime must pick which queued requests enter freed slots. This implements
// the reference's length-aware SequencePool scheduling idea
// (src/specdec/core/sequence_pool.py:41-226 — group similar-length
// sequences to minimize padding waste) as a native library with FCFS
// fairness bounds, plus an exponential-moving-average acceptance tracker
// that mirrors the AdaptiveKController policy
// (src/specdec/policies/controllers.py:63-141) for host-side K suggestion.
//
// Exposed as a C ABI for ctypes (no pybind11 in this environment); the
// Python fallback with identical semantics lives in native/__init__.py.

#include <algorithm>
#include <cstdint>
#include <deque>
#include <map>
#include <vector>

namespace {

struct Request {
  int64_t id;
  int32_t prompt_len;
  int32_t max_new;
  int64_t seq;        // arrival order
  int64_t round_in;   // admission round at submission
};

struct Scheduler {
  std::deque<Request> queue;
  int64_t next_seq = 0;
  int64_t round = 0;       // admission rounds elapsed
  int32_t length_bucket;   // bucket width for "same length" grouping
  int32_t max_wait;        // max admission ROUNDS a request may wait
  // Adaptive-K EMA state (reference: sliding window of 32; EMA with
  // alpha = 2/(window+1) is the streaming equivalent).
  double accept_ema = 0.5;
  double ema_alpha;
  int32_t k = 4, min_k = 1, max_k = 8;
  double target_acceptance = 0.5;
};

}  // namespace

extern "C" {

Scheduler* sched_create(int32_t length_bucket, int32_t max_wait,
                        int32_t init_k, int32_t min_k, int32_t max_k,
                        double target_acceptance, int32_t window) {
  auto* s = new Scheduler();
  s->length_bucket = length_bucket > 0 ? length_bucket : 1;
  s->max_wait = max_wait;
  s->k = init_k;
  s->min_k = min_k;
  s->max_k = max_k;
  s->target_acceptance = target_acceptance;
  s->ema_alpha = 2.0 / (double(window > 0 ? window : 32) + 1.0);
  return s;
}

void sched_destroy(Scheduler* s) { delete s; }

void sched_submit(Scheduler* s, int64_t id, int32_t prompt_len,
                  int32_t max_new) {
  s->queue.push_back({id, prompt_len, max_new, s->next_seq++, s->round});
}

int32_t sched_pending(Scheduler* s) { return (int32_t)s->queue.size(); }

// Pick up to n_slots requests. Strategy (SequencePool semantics + fairness,
// reference sequence_pool.py:112-226 — same-length groups first, mixed
// fallback): anchor on the most-populated length bucket so whole
// same-length groups ship together (minimal padding waste); but if the
// oldest request has been overtaken by more than max_wait arrivals, anchor
// on it instead (FCFS fairness bound). Overdue requests are always eligible
// fillers. Returns the number of ids written into out_ids.
int32_t sched_admit(Scheduler* s, int32_t n_slots, int64_t* out_ids) {
  int32_t n = 0;
  s->round += 1;
  while (n < n_slots && !s->queue.empty()) {
    // Pick the anchor bucket.
    const bool oldest_overdue =
        (s->round - s->queue.front().round_in) > s->max_wait;
    int32_t bucket;
    if (oldest_overdue) {
      bucket = s->queue.front().prompt_len / s->length_bucket;
    } else {
      std::map<int32_t, int32_t> counts;
      for (const auto& r : s->queue) counts[r.prompt_len / s->length_bucket]++;
      bucket = counts.begin()->first;
      int32_t best = 0;
      for (const auto& kv : counts)
        if (kv.second > best) { best = kv.second; bucket = kv.first; }
    }
    // Admit same-bucket requests oldest-first, plus any overdue request.
    for (auto it = s->queue.begin(); it != s->queue.end() && n < n_slots;) {
      bool same = (it->prompt_len / s->length_bucket) == bucket;
      bool overdue = (s->round - it->round_in) > s->max_wait;
      if (same || overdue) {
        out_ids[n++] = it->id;
        it = s->queue.erase(it);
      } else {
        ++it;
      }
    }
  }
  return n;
}

// Record one spec step's outcome; returns the suggested K.
int32_t sched_record_step(Scheduler* s, int32_t proposed, int32_t accepted) {
  if (proposed > 0) {
    double rate = double(accepted) / double(proposed);
    s->accept_ema = s->accept_ema + s->ema_alpha * (rate - s->accept_ema);
    if (s->accept_ema > s->target_acceptance + 0.1 && s->k < s->max_k) {
      s->k += 1;
    } else if (s->accept_ema < s->target_acceptance - 0.1 && s->k > s->min_k) {
      s->k -= 1;
    }
  }
  return s->k;
}

double sched_acceptance_ema(Scheduler* s) { return s->accept_ema; }
int32_t sched_current_k(Scheduler* s) { return s->k; }

}  // extern "C"
