// dspav: libavformat/libavcodec decode shim for dsp_tpu.
//
// The reference's ffmpeg codec (/root/reference/ffmpeg.c) dlopens libav* and
// decodes any container/codec pair to interleaved doubles. This shim links
// the same libraries behind a minimal C ABI consumed via ctypes
// (dsp_tpu/codecs/ffmpeg.py): open / info / read / seek / close.

extern "C" {
#include <libavcodec/avcodec.h>
#include <libavformat/avformat.h>
#include <libavutil/avutil.h>
#include <libavutil/channel_layout.h>
}

#include <cstring>
#include <vector>

namespace {

struct Dec {
    AVFormatContext *fmt = nullptr;
    AVCodecContext *cc = nullptr;
    AVPacket *pkt = nullptr;
    AVFrame *frame = nullptr;
    int stream = -1;
    int channels = 0;
    int fs = 0;
    int64_t frames = -1;
    // leftover decoded samples (interleaved doubles)
    std::vector<double> buf;
    size_t buf_off = 0;
    int64_t last_ts = 0;  // best-effort pts of the last decoded frame
    bool draining = false;
    bool eof = false;
};

double get_sample(const AVFrame *f, int fmt, int ch, int i) {
    // planar reads go through extended_data like the reference
    // (ffmpeg.c:214): data[] is a fixed 8-pointer array, so >8-channel
    // planar audio would index out of bounds
    switch (fmt) {
    case AV_SAMPLE_FMT_U8:
        return (((const uint8_t *)f->extended_data[0])[i * f->ch_layout.nb_channels + ch] - 128.0) / 128.0;
    case AV_SAMPLE_FMT_U8P:
        return (((const uint8_t *)f->extended_data[ch])[i] - 128.0) / 128.0;
    case AV_SAMPLE_FMT_S16:
        return ((const int16_t *)f->extended_data[0])[i * f->ch_layout.nb_channels + ch] / 32768.0;
    case AV_SAMPLE_FMT_S16P:
        return ((const int16_t *)f->extended_data[ch])[i] / 32768.0;
    case AV_SAMPLE_FMT_S32:
        return ((const int32_t *)f->extended_data[0])[i * f->ch_layout.nb_channels + ch] / 2147483648.0;
    case AV_SAMPLE_FMT_S32P:
        return ((const int32_t *)f->extended_data[ch])[i] / 2147483648.0;
    case AV_SAMPLE_FMT_FLT:
        return ((const float *)f->extended_data[0])[i * f->ch_layout.nb_channels + ch];
    case AV_SAMPLE_FMT_FLTP:
        return ((const float *)f->extended_data[ch])[i];
    case AV_SAMPLE_FMT_DBL:
        return ((const double *)f->extended_data[0])[i * f->ch_layout.nb_channels + ch];
    case AV_SAMPLE_FMT_DBLP:
        return ((const double *)f->extended_data[ch])[i];
    case AV_SAMPLE_FMT_S64:
        return ((const int64_t *)f->extended_data[0])[i * f->ch_layout.nb_channels + ch] / 9223372036854775808.0;
    case AV_SAMPLE_FMT_S64P:
        return ((const int64_t *)f->extended_data[ch])[i] / 9223372036854775808.0;
    }
    return 0.0;
}

// decode until at least one frame of samples is appended or EOF
bool fill(Dec *d) {
    while (true) {
        int r = avcodec_receive_frame(d->cc, d->frame);
        if (r == 0) {
            const int n = d->frame->nb_samples;
            const int fmt = d->frame->format;
            // a mid-stream channel-count drop must not read missing planes
            const int fch = d->frame->ch_layout.nb_channels;
            const int rch = fch < d->channels ? fch : d->channels;
            if (d->frame->best_effort_timestamp != AV_NOPTS_VALUE)
                d->last_ts = d->frame->best_effort_timestamp;
            const size_t base = d->buf.size();
            d->buf.resize(base + (size_t)n * d->channels, 0.0);
            for (int i = 0; i < n; ++i)
                for (int c = 0; c < rch; ++c)
                    d->buf[base + (size_t)i * d->channels + c] =
                        get_sample(d->frame, fmt, c, i);
            av_frame_unref(d->frame);
            return true;
        }
        if (r == AVERROR_EOF) { d->eof = true; return false; }
        if (r != AVERROR(EAGAIN)) { d->eof = true; return false; }
        if (d->draining) { d->eof = true; return false; }
        // need more input
        while (true) {
            int pr = av_read_frame(d->fmt, d->pkt);
            if (pr < 0) {
                d->draining = true;
                avcodec_send_packet(d->cc, nullptr);
                break;
            }
            if (d->pkt->stream_index == d->stream) {
                avcodec_send_packet(d->cc, d->pkt);
                av_packet_unref(d->pkt);
                break;
            }
            av_packet_unref(d->pkt);
        }
    }
}

}  // namespace

extern "C" {

void *dspav_open(const char *path) {
    auto *d = new Dec();
    if (avformat_open_input(&d->fmt, path, nullptr, nullptr) < 0) {
        delete d;
        return nullptr;
    }
    if (avformat_find_stream_info(d->fmt, nullptr) < 0) goto fail;
    {
        const AVCodec *codec = nullptr;
        d->stream = av_find_best_stream(d->fmt, AVMEDIA_TYPE_AUDIO, -1, -1, &codec, 0);
        if (d->stream < 0 || !codec) goto fail;
        AVStream *st = d->fmt->streams[d->stream];
        d->cc = avcodec_alloc_context3(codec);
        if (!d->cc) goto fail;
        if (avcodec_parameters_to_context(d->cc, st->codecpar) < 0) goto fail;
        if (avcodec_open2(d->cc, codec, nullptr) < 0) goto fail;
        d->channels = d->cc->ch_layout.nb_channels;
        d->fs = d->cc->sample_rate;
        // 0 channels / 0 rate would SIGFPE in read (division) and seek
        // (AVRational{1, 0}); fail so dispatch falls through to sndfile
        if (d->channels <= 0 || d->fs <= 0) goto fail;
        if (st->duration > 0)
            d->frames = av_rescale_q(st->duration, st->time_base,
                                     AVRational{1, d->fs});
        else if (d->fmt->duration > 0)
            d->frames = av_rescale(d->fmt->duration, d->fs, AV_TIME_BASE);
        d->pkt = av_packet_alloc();
        d->frame = av_frame_alloc();
        if (!d->pkt || !d->frame) goto fail;
    }
    return d;
fail:
    if (d->frame) av_frame_free(&d->frame);
    if (d->pkt) av_packet_free(&d->pkt);
    if (d->cc) avcodec_free_context(&d->cc);
    if (d->fmt) avformat_close_input(&d->fmt);
    delete d;
    return nullptr;
}

int dspav_channels(void *h) { return ((Dec *)h)->channels; }
int dspav_sample_rate(void *h) { return ((Dec *)h)->fs; }
int64_t dspav_frames(void *h) { return ((Dec *)h)->frames; }

int64_t dspav_read(void *h, double *dst, int64_t want) {
    auto *d = (Dec *)h;
    int64_t out = 0;
    while (out < want) {
        int64_t avail = (int64_t)(d->buf.size() - d->buf_off) / d->channels;
        if (avail > 0) {
            int64_t take = avail < want - out ? avail : want - out;
            memcpy(dst + out * d->channels, d->buf.data() + d->buf_off,
                   (size_t)take * d->channels * sizeof(double));
            d->buf_off += (size_t)take * d->channels;
            out += take;
            if (d->buf_off >= d->buf.size()) {
                d->buf.clear();
                d->buf_off = 0;
            }
            continue;
        }
        if (d->eof) break;
        if (!fill(d)) break;
    }
    return out;
}

int64_t dspav_seek(void *h, int64_t frame) {
    auto *d = (Dec *)h;
    AVStream *st = d->fmt->streams[d->stream];
    int64_t ts = av_rescale_q(frame, AVRational{1, d->fs}, st->time_base);
    if (avformat_seek_file(d->fmt, d->stream, INT64_MIN, ts, INT64_MAX, 0) < 0)
        return -1;
    avcodec_flush_buffers(d->cc);
    d->buf.clear();
    d->buf_off = 0;
    d->draining = false;
    d->eof = false;
    // report the position actually landed on: demuxers seek to a keyframe
    // possibly well before the target, and the reference derives the real
    // position from the first post-seek timestamp (ffmpeg.c:243-245). The
    // decoded frame's samples stay buffered, so reads continue from there.
    if (!fill(d))
        return frame;  // seeked into EOF: no frame to measure
    return av_rescale_q(d->last_ts, st->time_base, AVRational{1, d->fs});
}

int dspav_sample_fmt(void *h) { return (int)((Dec *)h)->cc->sample_fmt; }

const char *dspav_sample_fmt_name(void *h) {
    return av_get_sample_fmt_name(((Dec *)h)->cc->sample_fmt);
}

void dspav_close(void *h) {
    auto *d = (Dec *)h;
    if (d->frame) av_frame_free(&d->frame);
    if (d->pkt) av_packet_free(&d->pkt);
    if (d->cc) avcodec_free_context(&d->cc);
    if (d->fmt) avformat_close_input(&d->fmt);
    delete d;
}

}  // extern "C"
