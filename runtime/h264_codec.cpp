// Native h264 codec shim over the system libavcodec/libavformat/libswscale.
//
// The reference conditions LTX i2v inputs through a libx264 CRF-29
// round-trip to match the VAE's training-data compression artifacts
// (/root/reference/ltx_video/pipelines/crf_compressor.py:34-50), and
// writes outputs as h264 mp4 (/root/reference/inference.py:215-258).
// This image ships no ffmpeg binary and no PyAV, but the system
// libavcodec.so.59 carries the libx264 encoder + h264 decoder — this
// shim exposes both through a minimal C ABI for ctypes
// (ltx_video_gpupoor_tpu/utils/native_codec.py).
//
// Exported:
//   h264_roundtrip(rgb, h, w, crf, out_rgb)  -> 0 on success
//   h264_write_mp4(path, rgb_frames, n, h, w, fps, crf) -> 0 on success
//   h264_write_mp4_yuv(path, y, u, v, n, h, w, fps, crf) -> 0 on success
//     (planar YUV420 input — skips the RGB->YUV swscale pass; used by the
//      serving path, which converts RGB->YUV420 ON DEVICE so the
//      host fetch moves 1.5 bytes/px instead of 3)

extern "C" {
#include <libavcodec/avcodec.h>
#include <libavformat/avformat.h>
#include <libavutil/imgutils.h>
#include <libavutil/opt.h>
#include <libswscale/swscale.h>
}

#include <cstdint>
#include <cstring>
#include <vector>

namespace {

// libx264 prints encode statistics at AV_LOG_INFO; keep the host logs
// clean (the Python layer reports failures via return codes).
struct QuietLogs {
    QuietLogs() { av_log_set_level(AV_LOG_ERROR); }
} quiet_logs;

struct Encoder {
    const AVCodec* codec = nullptr;
    AVCodecContext* ctx = nullptr;
    SwsContext* sws = nullptr;  // RGB24 -> YUV420P
    AVFrame* yuv = nullptr;

    // global_header: mp4 wants extradata; the raw round-trip wants
    // in-band annex-b headers so decoder needs no side channel.
    // preset: x264 speed preset for the encode, or nullptr for the
    // library default ("medium"). The mp4 WRITER uses "veryfast" (the
    // write is host-side latency on the serving path — measured 7.5 s
    // of a 22 s full request at medium for 121x704x480 frames; CRF-rate
    // control keeps quality pinned). The CRF-29 conditioning ROUND-TRIP
    // keeps the default preset: its job is matching the VAE's training
    // artifact distribution, not speed.
    int open(int w, int h, double fps, int crf, bool global_header,
             const char* preset = nullptr) {
        codec = avcodec_find_encoder_by_name("libx264");
        if (!codec) return -1;
        ctx = avcodec_alloc_context3(codec);
        if (!ctx) return -2;
        ctx->width = w;
        ctx->height = h;
        ctx->pix_fmt = AV_PIX_FMT_YUV420P;
        ctx->time_base = AVRational{1000, (int)(fps * 1000 + 0.5)};
        ctx->framerate = AVRational{(int)(fps * 1000 + 0.5), 1000};
        // b-frames delay dts behind pts; the mp4 muxer then emits an edit
        // list that clips the final sample (demuxers mark it
        // AV_PKT_FLAG_DISCARD and the last frame is silently dropped on
        // decode). dts==pts sidesteps all of it.
        ctx->max_b_frames = 0;
        if (global_header) ctx->flags |= AV_CODEC_FLAG_GLOBAL_HEADER;
        char crfs[16];
        snprintf(crfs, sizeof crfs, "%d", crf);
        av_opt_set(ctx->priv_data, "crf", crfs, 0);
        if (preset) av_opt_set(ctx->priv_data, "preset", preset, 0);
        if (avcodec_open2(ctx, codec, nullptr) < 0) return -3;
        sws = sws_getContext(w, h, AV_PIX_FMT_RGB24, w, h,
                             AV_PIX_FMT_YUV420P, SWS_BILINEAR, nullptr,
                             nullptr, nullptr);
        if (!sws) return -4;
        yuv = av_frame_alloc();
        yuv->format = AV_PIX_FMT_YUV420P;
        yuv->width = w;
        yuv->height = h;
        if (av_frame_get_buffer(yuv, 0) < 0) return -5;
        return 0;
    }

    int send_rgb(const uint8_t* rgb, int64_t pts) {
        const uint8_t* src[1] = {rgb};
        int stride[1] = {ctx->width * 3};
        av_frame_make_writable(yuv);
        sws_scale(sws, src, stride, 0, ctx->height, yuv->data,
                  yuv->linesize);
        yuv->pts = pts;
        return avcodec_send_frame(ctx, yuv);
    }

    // Planar YUV420 input: tight planes (stride == width), copied
    // row-wise into the (possibly padded) AVFrame linesizes.
    int send_yuv(const uint8_t* y, const uint8_t* u, const uint8_t* v,
                 int64_t pts) {
        av_frame_make_writable(yuv);
        const int w = ctx->width, h = ctx->height;
        for (int r = 0; r < h; ++r)
            memcpy(yuv->data[0] + (size_t)r * yuv->linesize[0],
                   y + (size_t)r * w, w);
        const int cw = w / 2, ch = h / 2;
        for (int r = 0; r < ch; ++r) {
            memcpy(yuv->data[1] + (size_t)r * yuv->linesize[1],
                   u + (size_t)r * cw, cw);
            memcpy(yuv->data[2] + (size_t)r * yuv->linesize[2],
                   v + (size_t)r * cw, cw);
        }
        yuv->pts = pts;
        return avcodec_send_frame(ctx, yuv);
    }

    ~Encoder() {
        if (yuv) av_frame_free(&yuv);
        if (sws) sws_freeContext(sws);
        if (ctx) avcodec_free_context(&ctx);
    }
};

struct Decoder {
    AVCodecContext* ctx = nullptr;
    SwsContext* sws = nullptr;  // YUV -> RGB24
    AVFrame* frame = nullptr;

    int open() {
        const AVCodec* codec = avcodec_find_decoder(AV_CODEC_ID_H264);
        if (!codec) return -1;
        ctx = avcodec_alloc_context3(codec);
        if (!ctx || avcodec_open2(ctx, codec, nullptr) < 0) return -2;
        frame = av_frame_alloc();
        return 0;
    }

    // Returns 0 when a frame was produced into out_rgb.
    int receive_rgb(uint8_t* out_rgb, int w, int h) {
        if (avcodec_receive_frame(ctx, frame) < 0) return -1;
        if (!sws) {
            sws = sws_getContext(frame->width, frame->height,
                                 (AVPixelFormat)frame->format, w, h,
                                 AV_PIX_FMT_RGB24, SWS_BILINEAR, nullptr,
                                 nullptr, nullptr);
            if (!sws) return -2;
        }
        uint8_t* dst[1] = {out_rgb};
        int stride[1] = {w * 3};
        sws_scale(sws, frame->data, frame->linesize, 0, frame->height,
                  dst, stride);
        return 0;
    }

    ~Decoder() {
        if (frame) av_frame_free(&frame);
        if (sws) sws_freeContext(sws);
        if (ctx) avcodec_free_context(&ctx);
    }
};

// Shared mp4 muxing loop; `send` submits frame i to the encoder.
template <typename SendFrame>
int write_mp4_impl(const char* path, int n, int h, int w, double fps,
                   int crf, SendFrame send) {
    AVFormatContext* fmt = nullptr;
    if (avformat_alloc_output_context2(&fmt, nullptr, "mp4", path) < 0 ||
        !fmt)
        return -1;
    AVPacket* pkt = nullptr;
    // single exit path: every return (error or success) releases the
    // muxer, the open file handle, and the packet — a long-lived serving
    // process retries failed writes and must not leak fds per attempt
    auto finish = [&](int code) {
        if (pkt) av_packet_free(&pkt);
        if (!(fmt->oformat->flags & AVFMT_NOFILE) && fmt->pb)
            avio_closep(&fmt->pb);
        avformat_free_context(fmt);
        return code;
    };

    Encoder enc;
    int rc = enc.open(w, h, fps, crf, /*global_header=*/true,
                      /*preset=*/"veryfast");
    if (rc) return finish(rc - 30);

    AVStream* st = avformat_new_stream(fmt, nullptr);
    if (!st) return finish(-2);
    st->time_base = enc.ctx->time_base;
    avcodec_parameters_from_context(st->codecpar, enc.ctx);

    if (!(fmt->oformat->flags & AVFMT_NOFILE) &&
        avio_open(&fmt->pb, path, AVIO_FLAG_WRITE) < 0)
        return finish(-3);
    if (avformat_write_header(fmt, nullptr) < 0) return finish(-4);

    pkt = av_packet_alloc();
    auto drain = [&]() {
        while (avcodec_receive_packet(enc.ctx, pkt) == 0) {
            if (pkt->duration == 0) pkt->duration = 1;  // one tick per frame
            av_packet_rescale_ts(pkt, enc.ctx->time_base, st->time_base);
            pkt->stream_index = st->index;
            av_interleaved_write_frame(fmt, pkt);
            av_packet_unref(pkt);
        }
    };
    for (int i = 0; i < n; ++i) {
        if (send(enc, i) < 0) return finish(-5);
        drain();
    }
    avcodec_send_frame(enc.ctx, nullptr);
    drain();
    av_write_trailer(fmt);
    return finish(0);
}

}  // namespace

extern "C" {

// Encode one RGB24 frame at the given CRF and decode it back — the
// conditioning-image artifact round-trip. Annex-b in-band headers, so
// encoder packets feed the decoder directly (no container).
int h264_roundtrip(const uint8_t* rgb, int h, int w, int crf,
                   uint8_t* out_rgb) {
    Encoder enc;
    int rc = enc.open(w, h, 30.0, crf, /*global_header=*/false);
    if (rc) return rc;
    Decoder dec;
    if ((rc = dec.open())) return rc - 10;

    if (enc.send_rgb(rgb, 0) < 0) return -20;
    avcodec_send_frame(enc.ctx, nullptr);  // flush

    AVPacket* pkt = av_packet_alloc();
    bool got = false;
    while (avcodec_receive_packet(enc.ctx, pkt) == 0) {
        avcodec_send_packet(dec.ctx, pkt);
        av_packet_unref(pkt);
        if (dec.receive_rgb(out_rgb, w, h) == 0) got = true;
    }
    avcodec_send_packet(dec.ctx, nullptr);  // flush decoder
    while (!got && dec.receive_rgb(out_rgb, w, h) == 0) got = true;
    av_packet_free(&pkt);
    return got ? 0 : -21;
}

// Write [n, h, w, 3] RGB24 frames as an h264 mp4.
int h264_write_mp4(const char* path, const uint8_t* rgb_frames, int n,
                   int h, int w, double fps, int crf) {
    const size_t fsz = (size_t)h * w * 3;
    return write_mp4_impl(path, n, h, w, fps, crf,
                          [&](Encoder& enc, int i) {
                              return enc.send_rgb(rgb_frames + fsz * i, i);
                          });
}

// Write planar YUV420 frames (y: [n, h, w], u/v: [n, h/2, w/2], tight
// strides) as an h264 mp4 — no host-side colorspace conversion.
int h264_write_mp4_yuv(const char* path, const uint8_t* y,
                       const uint8_t* u, const uint8_t* v, int n, int h,
                       int w, double fps, int crf) {
    if (h % 2 || w % 2) return -40;
    const size_t ysz = (size_t)h * w, csz = ysz / 4;
    return write_mp4_impl(path, n, h, w, fps, crf,
                          [&](Encoder& enc, int i) {
                              return enc.send_yuv(y + ysz * i, u + csz * i,
                                                  v + csz * i, i);
                          });
}

// Decode an h264/mp4 (or anything libavformat can open) back to RGB24.
// Two-phase: call with frames=null to count; then with a buffer of
// capacity max_frames. Returns the frame count, or <0 on error.
int h264_read_video(const char* path, uint8_t* frames, int max_frames,
                    int* out_h, int* out_w) {
    AVFormatContext* fmt = nullptr;
    if (avformat_open_input(&fmt, path, nullptr, nullptr) < 0) return -1;
    if (avformat_find_stream_info(fmt, nullptr) < 0) {
        avformat_close_input(&fmt);
        return -2;
    }
    int vi = av_find_best_stream(fmt, AVMEDIA_TYPE_VIDEO, -1, -1, nullptr, 0);
    if (vi < 0) {
        avformat_close_input(&fmt);
        return -3;
    }
    const AVCodec* codec =
        avcodec_find_decoder(fmt->streams[vi]->codecpar->codec_id);
    AVCodecContext* ctx = avcodec_alloc_context3(codec);
    avcodec_parameters_to_context(ctx, fmt->streams[vi]->codecpar);
    if (avcodec_open2(ctx, codec, nullptr) < 0) {
        avcodec_free_context(&ctx);
        avformat_close_input(&fmt);
        return -4;
    }
    int w = ctx->width, h = ctx->height;
    if (frames && *out_h > 0 && (*out_h != h || *out_w != w)) {
        // the caller's buffer was sized from a previous (counting) call;
        // if the file changed in between, writing at the new dims would
        // overflow that allocation — refuse instead
        avcodec_free_context(&ctx);
        avformat_close_input(&fmt);
        return -5;
    }
    *out_h = h;
    *out_w = w;
    SwsContext* sws = nullptr;
    AVFrame* fr = av_frame_alloc();
    AVPacket* pkt = av_packet_alloc();
    int count = 0;
    const size_t fsz = (size_t)h * w * 3;
    auto take = [&]() {
        while (avcodec_receive_frame(ctx, fr) == 0) {
            if (frames && count < max_frames) {
                if (!sws)
                    sws = sws_getContext(fr->width, fr->height,
                                         (AVPixelFormat)fr->format, w, h,
                                         AV_PIX_FMT_RGB24, SWS_BILINEAR,
                                         nullptr, nullptr, nullptr);
                uint8_t* dst[1] = {frames + fsz * count};
                int stride[1] = {w * 3};
                sws_scale(sws, fr->data, fr->linesize, 0, fr->height, dst,
                          stride);
            }
            ++count;
        }
    };
    while (av_read_frame(fmt, pkt) >= 0) {
        if (pkt->stream_index == vi) {
            avcodec_send_packet(ctx, pkt);
            take();
        }
        av_packet_unref(pkt);
    }
    avcodec_send_packet(ctx, nullptr);
    take();
    av_packet_free(&pkt);
    av_frame_free(&fr);
    if (sws) sws_freeContext(sws);
    avcodec_free_context(&ctx);
    avformat_close_input(&fmt);
    return count;
}

}  // extern "C"
