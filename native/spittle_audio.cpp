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
