// Native audio runtime: lock-free SPSC ring buffer + PCM conversion.
//
// The reference's capture path runs in Rust: the cpal callback converts
// any sample format to mono f32 and hands chunks across a channel
// (src-tauri/src/audio_toolkit/audio/recorder.rs:182-206). This library is
// the equivalent native layer for the TPU framework's host runtime: the OS
// audio callback writes into a single-producer single-consumer ring without
// locks or allocation, and the Python consumer drains it in bulk. PCM
// conversion (u8/i16/i32 interleaved -> mono f32) happens in C++ so the
// real-time thread never touches the interpreter.
//
// C ABI for ctypes; no dependencies beyond the C++17 standard library.

#include <atomic>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <new>

extern "C" {

struct RingBuffer {
    float* data;
    uint64_t capacity;            // power of two
    uint64_t mask;
    std::atomic<uint64_t> head;   // write index (producer)
    std::atomic<uint64_t> tail;   // read index (consumer)
    std::atomic<uint64_t> dropped;
};

static uint64_t next_pow2(uint64_t v) {
    uint64_t p = 1;
    while (p < v) p <<= 1;
    return p;
}

RingBuffer* ring_create(uint64_t min_capacity) {
    auto* rb = new (std::nothrow) RingBuffer();
    if (!rb) return nullptr;
    rb->capacity = next_pow2(min_capacity < 2 ? 2 : min_capacity);
    rb->mask = rb->capacity - 1;
    rb->data = new (std::nothrow) float[rb->capacity];
    if (!rb->data) { delete rb; return nullptr; }
    rb->head.store(0, std::memory_order_relaxed);
    rb->tail.store(0, std::memory_order_relaxed);
    rb->dropped.store(0, std::memory_order_relaxed);
    return rb;
}

void ring_destroy(RingBuffer* rb) {
    if (!rb) return;
    delete[] rb->data;
    delete rb;
}

uint64_t ring_capacity(const RingBuffer* rb) { return rb->capacity; }

uint64_t ring_available(const RingBuffer* rb) {
    return rb->head.load(std::memory_order_acquire) -
           rb->tail.load(std::memory_order_acquire);
}

uint64_t ring_dropped(const RingBuffer* rb) {
    return rb->dropped.load(std::memory_order_relaxed);
}

// Producer: write n floats; drops the overflow (never blocks the RT thread).
// Returns samples actually written.
uint64_t ring_write(RingBuffer* rb, const float* src, uint64_t n) {
    uint64_t head = rb->head.load(std::memory_order_relaxed);
    uint64_t tail = rb->tail.load(std::memory_order_acquire);
    uint64_t space = rb->capacity - (head - tail);
    uint64_t todo = n < space ? n : space;
    if (todo < n) rb->dropped.fetch_add(n - todo, std::memory_order_relaxed);
    for (uint64_t i = 0; i < todo; ++i)
        rb->data[(head + i) & rb->mask] = src[i];
    rb->head.store(head + todo, std::memory_order_release);
    return todo;
}

// Consumer: read up to n floats into dst; returns count read.
uint64_t ring_read(RingBuffer* rb, float* dst, uint64_t n) {
    uint64_t tail = rb->tail.load(std::memory_order_relaxed);
    uint64_t head = rb->head.load(std::memory_order_acquire);
    uint64_t avail = head - tail;
    uint64_t todo = n < avail ? n : avail;
    for (uint64_t i = 0; i < todo; ++i)
        dst[i] = rb->data[(tail + i) & rb->mask];
    rb->tail.store(tail + todo, std::memory_order_release);
    return todo;
}

// -- PCM conversion (interleaved any-channel -> mono f32) -------------------

void pcm_i16_to_mono_f32(const int16_t* src, uint64_t frames,
                         uint32_t channels, float* dst) {
    const float scale = 1.0f / 32768.0f;
    for (uint64_t f = 0; f < frames; ++f) {
        int32_t acc = 0;
        for (uint32_t c = 0; c < channels; ++c) acc += src[f * channels + c];
        dst[f] = (float)acc / (float)channels * scale;
    }
}

void pcm_i32_to_mono_f32(const int32_t* src, uint64_t frames,
                         uint32_t channels, float* dst) {
    const double scale = 1.0 / 2147483648.0;
    for (uint64_t f = 0; f < frames; ++f) {
        double acc = 0;
        for (uint32_t c = 0; c < channels; ++c) acc += src[f * channels + c];
        dst[f] = (float)(acc / channels * scale);
    }
}

void pcm_u8_to_mono_f32(const uint8_t* src, uint64_t frames,
                        uint32_t channels, float* dst) {
    const float scale = 1.0f / 128.0f;
    for (uint64_t f = 0; f < frames; ++f) {
        int32_t acc = 0;
        for (uint32_t c = 0; c < channels; ++c)
            acc += (int32_t)src[f * channels + c] - 128;
        dst[f] = (float)acc / (float)channels * scale;
    }
}

void pcm_f32_to_mono(const float* src, uint64_t frames, uint32_t channels,
                     float* dst) {
    for (uint64_t f = 0; f < frames; ++f) {
        float acc = 0.0f;
        for (uint32_t c = 0; c < channels; ++c) acc += src[f * channels + c];
        dst[f] = acc / (float)channels;
    }
}

// Convenience: convert + write in one call from the RT callback.
uint64_t ring_write_i16(RingBuffer* rb, const int16_t* src, uint64_t frames,
                        uint32_t channels) {
    // Convert in fixed-size stack batches to avoid allocation.
    float buf[4096];
    uint64_t written = 0;
    while (frames > 0) {
        uint64_t batch = frames < 4096 ? frames : 4096;
        pcm_i16_to_mono_f32(src, batch, channels, buf);
        written += ring_write(rb, buf, batch);
        src += batch * channels;
        frames -= batch;
    }
    return written;
}

}  // extern "C"

// -- streaming polyphase resampler ------------------------------------------
//
// Host-side counterpart of audio/resample.py's FrameResampler: the filter
// tables (per-phase taps hp [L, K] and input offsets d [L]) are designed in
// Python (same kaiser design the offline MXU path uses) and passed in, so
// the native stream produces float32 outputs with identical taps. The C++
// side keeps the cross-push state (input buffer, absolute base index, next
// output index), making streamed output equal to offline resampling of the
// concatenated input. Lives here so the dictation hot path (mic thread ->
// 16 kHz frames) never enters the interpreter.

#include <vector>

namespace {

struct Resampler {
    int64_t L, M, K;
    std::vector<int64_t> d;   // [L] per-phase input offsets
    std::vector<float> hp;    // [L*K] per-phase taps
    int64_t dmin;
    std::vector<float> buf;   // input window (absolute index buf_base..)
    int64_t buf_base;
    int64_t received;         // total true input samples pushed
    int64_t next_out;         // next output index to produce
    bool finished;
};

int64_t ceil_div(int64_t a, int64_t b) { return (a + b - 1) / b; }

// Emit every output whose K-wide window fits inside [.., total_in).
int64_t drain(Resampler* r, int64_t total_in, float* out, int64_t cap,
              int64_t limit) {
    int64_t n = 0;
    while (n < cap && (limit < 0 || r->next_out < limit)) {
        int64_t j = r->next_out;
        int64_t p = j % r->L;
        int64_t start = (j / r->L) * r->M + r->d[p];
        if (start + r->K > total_in) break;  // start is monotonic in j
        const float* x = r->buf.data() + (start - r->buf_base);
        const float* h = r->hp.data() + p * r->K;
        float acc = 0.0f;
        for (int64_t k = 0; k < r->K; ++k) acc += x[k] * h[k];
        out[n++] = acc;
        r->next_out = j + 1;
    }
    // Drop input no future window can reach.
    int64_t min_start = (r->next_out / r->L) * r->M + r->dmin - r->buf_base;
    if (min_start > 0) {
        r->buf.erase(r->buf.begin(), r->buf.begin() + min_start);
        r->buf_base += min_start;
    }
    return n;
}

}  // namespace

extern "C" {

Resampler* resampler_create(int64_t L, int64_t M, int64_t K,
                            const int64_t* d, const float* hp) {
    auto* r = new (std::nothrow) Resampler();
    if (!r) return nullptr;
    r->L = L; r->M = M; r->K = K;
    r->d.assign(d, d + L);
    r->hp.assign(hp, hp + L * K);
    r->dmin = r->d[0];
    for (int64_t p = 1; p < L; ++p)
        if (r->d[p] < r->dmin) r->dmin = r->d[p];
    int64_t pad0 = r->dmin < 0 ? -r->dmin : 0;
    r->buf.assign(pad0, 0.0f);  // virtual zeros before the stream start
    r->buf_base = -pad0;
    r->received = 0;
    r->next_out = 0;
    r->finished = false;
    return r;
}

void resampler_destroy(Resampler* r) { delete r; }

// Push n input samples; writes ready outputs into out (cap floats).
// Returns outputs written. cap must be >= ceil((n + K*M)*L/M) to never
// truncate (the Python wrapper sizes it conservatively).
int64_t resampler_push(Resampler* r, const float* src, int64_t n,
                       float* out, int64_t cap) {
    if (r->finished) return -1;
    r->buf.insert(r->buf.end(), src, src + n);
    r->received += n;
    return drain(r, r->received, out, cap, -1);
}

// Flush: zero-extend so every remaining window is computable; emit exactly
// up to ceil(received*L/M) total outputs (offline-equivalent length).
int64_t resampler_finish(Resampler* r, float* out, int64_t cap) {
    if (r->finished) return -1;
    r->finished = true;
    int64_t out_len = ceil_div(r->received * r->L, r->M);
    int64_t tail = r->K + r->M;
    r->buf.insert(r->buf.end(), (size_t)tail, 0.0f);
    return drain(r, r->received + tail, out, cap, out_len);
}

int64_t resampler_pending_out(const Resampler* r) {
    // Upper bound of outputs the next finish() could emit.
    return ceil_div(r->received * r->L, r->M) - r->next_out;
}

// -- text similarity hot path ------------------------------------------------
//
// The reference's fuzzy custom-word correction runs strsim::levenshtein in
// Rust (audio_toolkit/text.rs); this is the same O(n*m) single-row DP over
// Unicode codepoints, called from text/filters.py for every (n-gram,
// custom-word) pair. Inputs are UTF-32 arrays prepared by the Python side.

// -- mu-law wire encode hot path ---------------------------------------------
//
// Serving's 8-bit audio wire (spittle_tpu/audio/mulaw.py): the encode runs
// on the host assembly thread for every outgoing batch (~23M samples per
// batch-48 group), where the numpy expression costs ~5 full passes over
// the buffer. One branchless fused pass here; decode stays on-device.
// Continuous mu-law curve (mu = 255), codes = round((y+1)*127.5) like the
// Python reference — outputs must match it bit-for-bit (tested).

static inline uint8_t mulaw_code(float x) {
    // Bit-exact with the numpy reference requires mirroring its MIXED
    // precision chain: np.log1p(MU*|x|) stays float32 (python-float
    // scalars are weak in numpy 2), the divide by np.log1p(MU) (a
    // float64 scalar) promotes to float64, and np.round rounds half to
    // even in float64. Knife-edge codes (x.4999999…) flip otherwise.
    float ax = x < 0.0f ? -x : x;
    if (ax > 1.0f) ax = 1.0f;
    float num = std::log1pf(255.0f * ax);            // f32, like numpy
    double y = (double)num / 5.5451774444795623;      // f64 np.log1p(255.0)
    double s = x < 0.0f ? -y : y;
    double code = (s + 1.0) * 127.5;
    double r = std::nearbyint(code);                  // half-to-even
    return (uint8_t)r;
}

void mulaw_encode_f32(const float* src, int64_t n, uint8_t* dst) {
    for (int64_t i = 0; i < n; ++i) dst[i] = mulaw_code(src[i]);
}

void mulaw_encode_i16(const int16_t* src, int64_t n, uint8_t* dst) {
    // int16 has only 65536 values: precompute the exact code table once
    // (same formula), then encoding is one gather per sample (~20x the
    // per-sample log1pf loop; the encode sits on the serving stager
    // thread next to a transfer it exists to halve).
    static const uint8_t* table = [] {  // magic static: thread-safe init
        static uint8_t t[65536];
        const float k = 1.0f / 32768.0f;
        for (int v = -32768; v < 32768; ++v)
            t[(uint16_t)(int16_t)v] = mulaw_code((int16_t)v * k);
        return t;
    }();
    for (int64_t i = 0; i < n; ++i) dst[i] = table[(uint16_t)src[i]];
}

int64_t levenshtein_u32(const uint32_t* a, int64_t n,
                        const uint32_t* b, int64_t m) {
    if (n == 0) return m;
    if (m == 0) return n;
    std::vector<int64_t> prev(m + 1), cur(m + 1);
    for (int64_t j = 0; j <= m; ++j) prev[j] = j;
    for (int64_t i = 1; i <= n; ++i) {
        cur[0] = i;
        const uint32_t ca = a[i - 1];
        for (int64_t j = 1; j <= m; ++j) {
            int64_t del = prev[j] + 1;
            int64_t ins = cur[j - 1] + 1;
            int64_t sub = prev[j - 1] + (ca != b[j - 1] ? 1 : 0);
            int64_t best = del < ins ? del : ins;
            cur[j] = best < sub ? best : sub;
        }
        std::swap(prev, cur);
    }
    return prev[m];
}

}  // extern "C"
