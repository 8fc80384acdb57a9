// howl_tpu native runtime: the host-side hot path of the serving client.
//
// The reference delegates these roles to third-party native libraries
// (PortAudio buffering, webrtcvad, libsndfile — SURVEY.md §2.9); here they are
// first-party so the Python layer never touches per-sample loops:
//
//   * a lock-free single-producer/single-consumer PCM ring buffer feeding the
//     62.5 ms re-scoring cadence (ref: howl/client/howl_client.py:85-94);
//   * int16 -> float32 conversion;
//   * frame-energy VAD (leading/trailing silence trim for alignment);
//   * 16-bit PCM WAV decode.
//
// Exposed with a plain C ABI for ctypes (no pybind11 in this image).

#include <atomic>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>

extern "C" {

// ---------------------------------------------------------------- ring buffer

struct RingBuffer {
    float* data;
    int64_t capacity;
    std::atomic<int64_t> write_pos;    // total samples PUBLISHED
    std::atomic<int64_t> reserve_pos;  // total samples RESERVED (intent, >= published)
};

RingBuffer* ring_create(int64_t capacity) {
    auto* rb = new RingBuffer();
    rb->data = new float[capacity]();
    rb->capacity = capacity;
    rb->write_pos.store(0);
    rb->reserve_pos.store(0);
    return rb;
}

void ring_destroy(RingBuffer* rb) {
    if (!rb) return;
    delete[] rb->data;
    delete rb;
}

// push int16 PCM; converts to float32 in [-1, 1]
void ring_push_i16(RingBuffer* rb, const int16_t* pcm, int64_t n) {
    int64_t pos = rb->write_pos.load(std::memory_order_relaxed);
    rb->reserve_pos.store(pos + n, std::memory_order_relaxed);
    // full fence: a release store would not keep the LATER data stores
    // from being reordered above it — the intent must be visible first
    std::atomic_thread_fence(std::memory_order_seq_cst);
    for (int64_t i = 0; i < n; ++i) {
        rb->data[(pos + i) % rb->capacity] = static_cast<float>(pcm[i]) / 32768.0f;
    }
    rb->write_pos.store(pos + n, std::memory_order_release);
}

void ring_push_f32(RingBuffer* rb, const float* pcm, int64_t n) {
    int64_t pos = rb->write_pos.load(std::memory_order_relaxed);
    rb->reserve_pos.store(pos + n, std::memory_order_relaxed);
    // full fence: a release store would not keep the LATER data stores
    // from being reordered above it — the intent must be visible first
    std::atomic_thread_fence(std::memory_order_seq_cst);
    for (int64_t i = 0; i < n; ++i) {
        rb->data[(pos + i) % rb->capacity] = pcm[i];
    }
    rb->write_pos.store(pos + n, std::memory_order_release);
}

int64_t ring_total_written(const RingBuffer* rb) {
    return rb->write_pos.load(std::memory_order_acquire);
}

// copy the most recent `n` samples into `out` (zero-padded on the left when
// fewer than n samples have been written). Returns samples actually available.
int64_t ring_latest(const RingBuffer* rb, float* out, int64_t n) {
    // seqlock-style read: a single producer may lap into the region being
    // copied. The copy is validated against reserve_pos (the producer's
    // write INTENT, published before it touches data) — write_pos alone
    // cannot catch a lap still in progress, since its release follows the
    // data stores.
    for (;;) {
        int64_t total = rb->write_pos.load(std::memory_order_acquire);
        int64_t avail = total < n ? total : n;
        // only `capacity` samples still exist; older slots have been overwritten
        if (avail > rb->capacity) avail = rb->capacity;
        int64_t pad = n - avail;
        std::memset(out, 0, sizeof(float) * pad);
        int64_t start = total - avail;
        for (int64_t i = 0; i < avail; ++i) {
            out[pad + i] = rb->data[(start + i) % rb->capacity];
        }
        // full fence: the copy's plain loads must complete before the
        // validation load (an acquire load only orders LATER accesses)
        std::atomic_thread_fence(std::memory_order_seq_cst);
        int64_t rsv = rb->reserve_pos.load(std::memory_order_relaxed);
        if (rsv - start <= rb->capacity) return avail;
    }
}

// ------------------------------------------------------------- pcm conversion

void pcm_i16_to_f32(const int16_t* in, float* out, int64_t n) {
    for (int64_t i = 0; i < n; ++i) out[i] = static_cast<float>(in[i]) / 32768.0f;
}

// ------------------------------------------------------------------ energy VAD

// milliseconds of leading non-voiced audio (frame RMS below threshold_db)
int64_t vad_leading_silence_ms(const float* audio, int64_t n, int sample_rate,
                               int frame_ms, float threshold_db) {
    int64_t frame_len = static_cast<int64_t>(frame_ms) * sample_rate / 1000;
    if (frame_len <= 0) return 0;
    int64_t ms = 0;
    for (int64_t start = 0; start + frame_len <= n; start += frame_len) {
        double acc = 0.0;
        for (int64_t i = 0; i < frame_len; ++i) {
            double v = audio[start + i];
            acc += v * v;
        }
        double rms = std::sqrt(acc / static_cast<double>(frame_len) + 1e-12);
        double db = 20.0 * std::log10(rms + 1e-12);
        if (db > threshold_db) break;
        ms += frame_ms;
    }
    return ms;
}

// ------------------------------------------------------ multi-stream ingest mux

// Host-side glue for BULK serving: N per-stream SPSC PCM rings drained in
// lockstep into one contiguous (N, hop) float32 batch per 62.5 ms tick — the
// input shape the batched online engines consume (howl_tpu/inference/
// online.py push(), streaming_trunk.py push()). One producer thread per
// stream (network/mic feeder) writes its row; ONE consumer (the serving
// loop) gathers; rows are independent, so producers never contend with each
// other. Publication protocol per stream: the producer RESERVES the span
// (reserve_pos + full fence) before touching ring data and PUBLISHES it
// (write_pos, release) after — the consumer sizes reads off write_pos and
// validates the copied span against reserve_pos, so an in-progress lap
// (producer mid-overwrite of the span being copied) is always detected.
// (write_pos alone cannot detect it: the data stores precede its release.)

struct StreamMux {
    int64_t n_streams;
    int64_t capacity;  // per-stream ring capacity, samples
    float* data;       // (n_streams, capacity) row-major
    std::atomic<int64_t>* write_pos;    // per stream: samples PUBLISHED
    std::atomic<int64_t>* reserve_pos;  // per stream: samples RESERVED (>= published)
    int64_t* read_pos;                  // consumer-owned: samples consumed
};

StreamMux* mux_create(int64_t n_streams, int64_t capacity) {
    auto* m = new StreamMux();
    m->n_streams = n_streams;
    m->capacity = capacity;
    m->data = new float[n_streams * capacity]();
    m->write_pos = new std::atomic<int64_t>[n_streams];
    m->reserve_pos = new std::atomic<int64_t>[n_streams];
    m->read_pos = new int64_t[n_streams]();
    for (int64_t s = 0; s < n_streams; ++s) {
        m->write_pos[s].store(0);
        m->reserve_pos[s].store(0);
    }
    return m;
}

void mux_destroy(StreamMux* m) {
    if (!m) return;
    delete[] m->data;
    delete[] m->write_pos;
    delete[] m->reserve_pos;
    delete[] m->read_pos;
    delete m;
}

// copy n samples into the ring row starting at absolute position pos, as at
// most two contiguous segments (memcpy-speed; a per-sample modulo loop would
// dominate the 62.5 ms tick budget at tens of thousands of streams)
static void row_write(float* row, int64_t capacity, int64_t pos, const float* src, int64_t n) {
    if (n > capacity) {  // only the newest `capacity` samples can survive
        src += n - capacity;
        pos += n - capacity;
        n = capacity;
    }
    int64_t off = pos % capacity;
    int64_t first = capacity - off < n ? capacity - off : n;
    std::memcpy(row + off, src, sizeof(float) * first);
    if (n > first) std::memcpy(row, src + first, sizeof(float) * (n - first));
}

void mux_push_f32(StreamMux* m, int64_t stream, const float* pcm, int64_t n) {
    float* row = m->data + stream * m->capacity;
    int64_t pos = m->write_pos[stream].load(std::memory_order_relaxed);
    m->reserve_pos[stream].store(pos + n, std::memory_order_relaxed);
    // full fence: a release store would not keep the LATER data stores
    // from being reordered above it — the intent must be visible first
    std::atomic_thread_fence(std::memory_order_seq_cst);
    row_write(row, m->capacity, pos, pcm, n);
    m->write_pos[stream].store(pos + n, std::memory_order_release);
}

void mux_push_i16(StreamMux* m, int64_t stream, const int16_t* pcm, int64_t n) {
    float* row = m->data + stream * m->capacity;
    int64_t pos = m->write_pos[stream].load(std::memory_order_relaxed);
    m->reserve_pos[stream].store(pos + n, std::memory_order_relaxed);
    // full fence: a release store would not keep the LATER data stores
    // from being reordered above it — the intent must be visible first
    std::atomic_thread_fence(std::memory_order_seq_cst);
    // convert in bounded chunks through a stack buffer, then 2-segment copy
    float tmp[2048];
    int64_t done = 0;
    while (done < n) {
        int64_t take = n - done < 2048 ? n - done : 2048;
        for (int64_t i = 0; i < take; ++i)
            tmp[i] = static_cast<float>(pcm[done + i]) / 32768.0f;
        row_write(row, m->capacity, pos + done, tmp, take);
        done += take;
    }
    m->write_pos[stream].store(pos + n, std::memory_order_release);
}

// samples waiting for the consumer on `stream` (>= 0; may exceed capacity if
// the producer lapped — the overrun is resolved at the next gather)
int64_t mux_pending(const StreamMux* m, int64_t stream) {
    // clamp: an overrun skip can persist read_pos past a reservation whose
    // publish hasn't landed yet, briefly putting read ahead of write
    int64_t d = m->write_pos[stream].load(std::memory_order_acquire) - m->read_pos[stream];
    return d < 0 ? 0 : d;
}

// Gather the next `hop` samples of EVERY stream into out (n_streams, hop):
//   status[s] = 1  ok — hop real samples consumed;
//   status[s] = 0  underrun — fewer than hop unread samples: the row is
//                  zero-filled and read_pos does NOT advance (the stream's
//                  audio is served on a later tick; a persistently late
//                  producer adds latency, never corruption);
//   status[s] = -1 overrun — the producer lapped the ring: read_pos skips to
//                  the oldest still-live sample (reserve - capacity),
//                  dropping the overwritten audio, then the hop is consumed
//                  (the row may be silence when the skip leaves < hop
//                  published samples, or in the pathological keep-lapping
//                  case).
// Returns the number of rows that delivered real (non-silence) audio.
// Gather streams [s_begin, s_end) into out rows [s_begin, s_end): the
// per-stream rows are independent, so a consumer may shard one tick's gather
// across threads by range (one core sustains ~16k streams at the 62.5 ms
// cadence on a small host — docs/PERFORMANCE.md).
int64_t mux_gather_range(StreamMux* m, float* out, int64_t hop, int8_t* status,
                         int64_t s_begin, int64_t s_end) {
    int64_t ok = 0;
    for (int64_t s = s_begin; s < s_end; ++s) {
        const float* row = m->data + s * m->capacity;
        float* dst = out + s * hop;
        for (int attempt = 0;; ++attempt) {
            int64_t wp = m->write_pos[s].load(std::memory_order_acquire);  // published
            int64_t rp = m->read_pos[s];
            int8_t st = 1;
            // size the skip off RESERVED, not published: a reservation past
            // rp + capacity means [rp, ...) may already be mid-overwrite
            int64_t rsv = m->reserve_pos[s].load(std::memory_order_acquire);
            if (rsv - rp > m->capacity) {  // producer lapped: oldest audio gone
                rp = rsv - m->capacity;
                st = -1;
            }
            if (wp - rp < hop) {  // underrun (possibly just after a skip)
                std::memset(dst, 0, sizeof(float) * hop);
                m->read_pos[s] = rp;  // persist any skip
                if (status) status[s] = st == -1 ? -1 : 0;
                break;
            }
            {  // 2-segment copy of [rp, rp+hop) out of the ring
                int64_t off = rp % m->capacity;
                int64_t first = m->capacity - off < hop ? m->capacity - off : hop;
                std::memcpy(dst, row + off, sizeof(float) * first);
                if (hop > first) std::memcpy(dst + first, row, sizeof(float) * (hop - first));
            }
            // the copy is valid iff no producer reservation reached into it
            // full fence before validating (see ring_latest)
            std::atomic_thread_fence(std::memory_order_seq_cst);
            int64_t rsv2 = m->reserve_pos[s].load(std::memory_order_relaxed);
            if (rsv2 - rp > m->capacity) {
                if (attempt < 8) continue;  // lap raced the copy: retry
                // producer laps faster than we can copy (pathological):
                // record the skip and emit silence this tick
                std::memset(dst, 0, sizeof(float) * hop);
                m->read_pos[s] = rsv2 - m->capacity;
                if (status) status[s] = -1;
                break;
            }
            m->read_pos[s] = rp + hop;
            if (status) status[s] = st;
            ++ok;
            break;
        }
    }
    return ok;
}

int64_t mux_gather(StreamMux* m, float* out, int64_t hop, int8_t* status) {
    return mux_gather_range(m, out, hop, status, 0, m->n_streams);
}

// -------------------------------------------------------------------- wav read

// Parse a 16-bit PCM WAV held in memory. Returns sample count (frames *
// channels) and fills *sample_rate / *channels; -1 on malformed input.
// Call once with out=null to size the buffer, then again to fill it.
int64_t wav_decode_i16(const uint8_t* bytes, int64_t n_bytes, float* out,
                       int32_t* sample_rate, int32_t* channels) {
    if (n_bytes < 44 || std::memcmp(bytes, "RIFF", 4) != 0 || std::memcmp(bytes + 8, "WAVE", 4) != 0)
        return -1;
    int64_t pos = 12;
    int32_t sr = 0, ch = 0, bits = 0;
    const uint8_t* data = nullptr;
    int64_t data_len = 0;
    while (pos + 8 <= n_bytes) {
        const uint8_t* hdr = bytes + pos;
        uint32_t chunk_len;
        std::memcpy(&chunk_len, hdr + 4, 4);
        if (std::memcmp(hdr, "fmt ", 4) == 0 && pos + 24 <= n_bytes) {
            int16_t ch16, bits16;
            int32_t sr32;
            std::memcpy(&ch16, hdr + 10, 2);
            std::memcpy(&sr32, hdr + 12, 4);
            std::memcpy(&bits16, hdr + 22, 2);
            ch = ch16;
            sr = sr32;
            bits = bits16;
        } else if (std::memcmp(hdr, "data", 4) == 0) {
            data = hdr + 8;
            data_len = chunk_len;
            if (pos + 8 + data_len > n_bytes) data_len = n_bytes - pos - 8;
        }
        pos += 8 + chunk_len + (chunk_len & 1);
    }
    if (!data || bits != 16 || ch <= 0 || sr <= 0) return -1;
    int64_t n_samples = data_len / 2;
    if (sample_rate) *sample_rate = sr;
    if (channels) *channels = ch;
    if (out) {
        for (int64_t i = 0; i < n_samples; ++i) {
            int16_t v;
            std::memcpy(&v, data + 2 * i, 2);
            out[i] = static_cast<float>(v) / 32768.0f;
        }
    }
    return n_samples;
}

}  // extern "C"
