// dspio: native audio I/O runtime for dsp_tpu.
//
// The reference implements its codec layer and threaded block buffers in C
// (/root/reference/pcm.c, sampleconv.c, codec_buf.c). This library provides
// the same native substrate for the TPU rebuild: RIFF/PCM file decode/encode
// with sample-format conversion, plus a prefetching reader thread that
// decodes ahead of the compute pipeline (codec_buf.c:247-347 analog).
//
// Exposed as a plain C ABI consumed via ctypes (dsp_tpu/codecs/native.py).

#include <algorithm>
#include <atomic>
#include <cmath>
#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <deque>
#include <mutex>
#include <string>
#include <thread>
#include <vector>

namespace {

enum Encoding {
    ENC_U8 = 0,
    ENC_S8,
    ENC_S16,
    ENC_S24,    // 24-bit in 32-bit container
    ENC_S24_3,  // packed 3-byte
    ENC_S32,
    ENC_FLOAT,
    ENC_DOUBLE,
};

int enc_bytes(int enc) {
    switch (enc) {
    case ENC_U8: case ENC_S8: return 1;
    case ENC_S16: return 2;
    case ENC_S24_3: return 3;
    case ENC_S24: case ENC_S32: case ENC_FLOAT: return 4;
    case ENC_DOUBLE: return 8;
    }
    return 0;
}

// BIT_PERFECT conversions (sampleconv.h semantics: scale 2^(n-1), clamp +FS)
inline double clamp_pos(double y, double scale) {
    return y > scale - 1.0 ? scale - 1.0 : y;
}

void raw_to_double(const uint8_t *src, double *dst, int64_t n, int enc) {
    switch (enc) {
    case ENC_U8:
        for (int64_t i = 0; i < n; ++i) dst[i] = ((double)src[i] - 128.0) / 128.0;
        break;
    case ENC_S8: {
        const int8_t *s = (const int8_t *)src;
        for (int64_t i = 0; i < n; ++i) dst[i] = (double)s[i] / 128.0;
        break;
    }
    case ENC_S16: {
        const int16_t *s = (const int16_t *)src;
        for (int64_t i = 0; i < n; ++i) dst[i] = (double)s[i] / 32768.0;
        break;
    }
    case ENC_S24: {
        const int32_t *s = (const int32_t *)src;
        for (int64_t i = 0; i < n; ++i) {
            int32_t v = (s[i] << 8) >> 8;
            dst[i] = (double)v / 8388608.0;
        }
        break;
    }
    case ENC_S24_3:
        for (int64_t i = 0; i < n; ++i) {
            int32_t v = (int32_t)src[i * 3] | ((int32_t)src[i * 3 + 1] << 8) |
                        ((int32_t)src[i * 3 + 2] << 16);
            v = (v << 8) >> 8;
            dst[i] = (double)v / 8388608.0;
        }
        break;
    case ENC_S32: {
        const int32_t *s = (const int32_t *)src;
        for (int64_t i = 0; i < n; ++i) dst[i] = (double)s[i] / 2147483648.0;
        break;
    }
    case ENC_FLOAT: {
        const float *s = (const float *)src;
        for (int64_t i = 0; i < n; ++i) dst[i] = (double)s[i];
        break;
    }
    case ENC_DOUBLE:
        memcpy(dst, src, n * sizeof(double));
        break;
    }
}

void double_to_raw(const double *src, uint8_t *dst, int64_t n, int enc) {
    switch (enc) {
    case ENC_U8:
        for (int64_t i = 0; i < n; ++i) {
            double y = std::nearbyint(src[i] * 128.0 + 128.0);
            dst[i] = (uint8_t)(y > 255.0 ? 255.0 : y);
        }
        break;
    case ENC_S8: {
        int8_t *d = (int8_t *)dst;
        for (int64_t i = 0; i < n; ++i)
            d[i] = (int8_t)clamp_pos(std::nearbyint(src[i] * 128.0), 128.0);
        break;
    }
    case ENC_S16: {
        int16_t *d = (int16_t *)dst;
        for (int64_t i = 0; i < n; ++i)
            d[i] = (int16_t)clamp_pos(std::nearbyint(src[i] * 32768.0), 32768.0);
        break;
    }
    case ENC_S24: {
        int32_t *d = (int32_t *)dst;
        for (int64_t i = 0; i < n; ++i)
            d[i] = (int32_t)clamp_pos(std::nearbyint(src[i] * 8388608.0), 8388608.0);
        break;
    }
    case ENC_S24_3:
        for (int64_t i = 0; i < n; ++i) {
            int32_t v = (int32_t)clamp_pos(std::nearbyint(src[i] * 8388608.0), 8388608.0);
            dst[i * 3] = v & 0xff;
            dst[i * 3 + 1] = (v >> 8) & 0xff;
            dst[i * 3 + 2] = (v >> 16) & 0xff;
        }
        break;
    case ENC_S32: {
        int32_t *d = (int32_t *)dst;
        for (int64_t i = 0; i < n; ++i)
            d[i] = (int32_t)clamp_pos(std::nearbyint(src[i] * 2147483648.0), 2147483648.0);
        break;
    }
    case ENC_FLOAT: {
        float *d = (float *)dst;
        for (int64_t i = 0; i < n; ++i) d[i] = (float)src[i];
        break;
    }
    case ENC_DOUBLE:
        memcpy(dst, src, n * sizeof(double));
        break;
    }
}

struct Reader {
    FILE *f = nullptr;
    int enc = ENC_S16;
    int channels = 1;
    int64_t data_off = 0;
    int64_t frames = -1;      // total frames, -1 unknown
    int64_t pos = 0;          // frame position (reader thread side)
    // prefetch
    std::thread thread;
    std::mutex mu;
    std::condition_variable cv_filled, cv_space;
    std::deque<std::vector<double>> queue;  // decoded interleaved blocks
    size_t max_blocks = 8;
    int64_t block_frames = 16384;
    std::vector<double> leftover;
    size_t leftover_off = 0;
    bool consumer_eof = false;  // consumer saw the EOF marker
    std::atomic<bool> stop{false};
    std::atomic<bool> eof{false};
    bool seek_requested = false;
    int64_t seek_target = 0;

    ~Reader() { shutdown(); }

    void shutdown() {
        {
            std::lock_guard<std::mutex> lk(mu);
            stop = true;
        }
        cv_space.notify_all();
        cv_filled.notify_all();
        if (thread.joinable()) thread.join();
        if (f) { fclose(f); f = nullptr; }
    }

    void worker() {
        const int bps = enc_bytes(enc);
        std::vector<uint8_t> raw((size_t)block_frames * channels * bps);
        for (;;) {
            {
                std::unique_lock<std::mutex> lk(mu);
                cv_space.wait(lk, [&] {
                    return stop || seek_requested || queue.size() < max_blocks;
                });
                if (stop) return;
                if (seek_requested) {
                    seek_requested = false;
                    queue.clear();
                    eof = false;
                    int64_t t = seek_target;
                    if (frames >= 0 && t > frames) t = frames;
                    if (t < 0) t = 0;
                    fseeko(f, data_off + t * (int64_t)channels * bps, SEEK_SET);
                    pos = t;
                }
            }
            int64_t want = block_frames;
            if (frames >= 0 && pos + want > frames) want = frames - pos;
            size_t got = 0;
            if (want > 0)
                got = fread(raw.data(), (size_t)channels * bps, (size_t)want, f);
            std::vector<double> block((size_t)got * channels);
            if (got)
                raw_to_double(raw.data(), block.data(), (int64_t)got * channels, enc);
            {
                std::lock_guard<std::mutex> lk(mu);
                if (seek_requested) continue;  // stale block
                pos += (int64_t)got;
                if (got == 0) eof = true;
                queue.push_back(std::move(block));
            }
            cv_filled.notify_all();
            if (got == 0) {
                // wait until seek or stop before spinning on EOF
                std::unique_lock<std::mutex> lk(mu);
                cv_space.wait(lk, [&] { return stop || seek_requested; });
                if (stop) return;
            }
        }
    }

    int64_t read(double *dst, int64_t want_frames) {
        int64_t out = 0;
        const int ch = channels;
        while (out < want_frames) {
            if (consumer_eof) break;
            if (leftover_off < leftover.size()) {
                int64_t avail = (int64_t)(leftover.size() - leftover_off) / ch;
                int64_t take = std::min<int64_t>(avail, want_frames - out);
                memcpy(dst + out * ch, leftover.data() + leftover_off,
                       (size_t)take * ch * sizeof(double));
                leftover_off += (size_t)take * ch;
                out += take;
                continue;
            }
            std::unique_lock<std::mutex> lk(mu);
            cv_filled.wait(lk, [&] { return stop || !queue.empty(); });
            if (stop) break;
            std::vector<double> blk = std::move(queue.front());
            queue.pop_front();
            lk.unlock();
            cv_space.notify_all();
            if (blk.empty()) { consumer_eof = true; break; }  // EOF marker
            leftover = std::move(blk);
            leftover_off = 0;
        }
        return out;
    }

    void seek(int64_t target) {
        {
            std::lock_guard<std::mutex> lk(mu);
            seek_requested = true;
            seek_target = target;
            leftover.clear();
            leftover_off = 0;
            consumer_eof = false;
            queue.clear();  // drop already-decoded stale blocks immediately
        }
        cv_space.notify_all();
    }
};

struct Writer {
    FILE *f = nullptr;
    int enc = ENC_S16;
    int channels = 1;
    std::vector<uint8_t> raw;
};

}  // namespace

extern "C" {

// --- raw (headerless) reader with prefetch thread ---

void *dspio_reader_open(const char *path, int enc, int channels,
                        int64_t data_off, int64_t frames, int64_t block_frames) {
    auto *r = new Reader();
    r->f = fopen(path, "rb");
    if (!r->f) { delete r; return nullptr; }
    r->enc = enc;
    r->channels = channels;
    r->data_off = data_off;
    r->frames = frames;
    r->block_frames = block_frames > 0 ? block_frames : 16384;
    fseeko(r->f, data_off, SEEK_SET);
    r->thread = std::thread(&Reader::worker, r);
    return r;
}

int64_t dspio_reader_read(void *h, double *dst, int64_t frames) {
    return ((Reader *)h)->read(dst, frames);
}

void dspio_reader_seek(void *h, int64_t frame) { ((Reader *)h)->seek(frame); }

void dspio_reader_close(void *h) { delete (Reader *)h; }

// --- writer (buffered encode) ---

void *dspio_writer_open(const char *path, int enc, int channels) {
    auto *w = new Writer();
    w->f = fopen(path, "w+b")  /* truncate: stale bytes beyond new data must go */;
    if (!w->f) w->f = fopen(path, "wb");
    if (!w->f) { delete w; return nullptr; }
    w->enc = enc;
    w->channels = channels;
    return w;
}

int64_t dspio_writer_write(void *h, const double *src, int64_t frames) {
    auto *w = (Writer *)h;
    const int64_t n = frames * w->channels;
    const int bps = enc_bytes(w->enc);
    w->raw.resize((size_t)(n * bps));
    double_to_raw(src, w->raw.data(), n, w->enc);
    return (int64_t)fwrite(w->raw.data(), (size_t)w->channels * bps, (size_t)frames, w->f);
}

void dspio_writer_seek_bytes(void *h, int64_t off) {
    fseeko(((Writer *)h)->f, off, SEEK_SET);
}

void dspio_writer_write_bytes(void *h, const uint8_t *data, int64_t n) {
    fwrite(data, 1, (size_t)n, ((Writer *)h)->f);
}

void dspio_writer_close(void *h) {
    auto *w = (Writer *)h;
    if (w->f) fclose(w->f);
    delete w;
}

// --- standalone conversion (for benchmarking / misc) ---

void dspio_raw_to_double(const uint8_t *src, double *dst, int64_t n, int enc) {
    raw_to_double(src, dst, n, enc);
}

void dspio_double_to_raw(const double *src, uint8_t *dst, int64_t n, int enc) {
    double_to_raw(src, dst, n, enc);
}

int dspio_version(void) { return 1; }

}  // extern "C"
