// vtc_decode — first-party libav video decode worker.
//
// TPU-native replacement for the reference's decode dependency: a custom
// torchvision/ffmpeg build with ffmpeg-side resize and segment seek
// (dataset_loaders.py:405-424, video_retrieval_videodatasets.py:91-99).
// This stage owns the demux/decode/convert pipeline directly on libav:
//
//   * avformat seek to the segment start (keyframe-backward, then drop
//     frames with pts < start) instead of sequential read-from-zero;
//   * decode to the codec's native YUV and run the swscale colorspace
//     convert + resize ONLY on the linspace-selected output frames. The
//     OpenCV fallback path (cv2.VideoCapture) cannot skip this: its read()
//     converts every decoded frame to BGR, which profiling showed is a
//     large share of the "raw decode" wall (PERFORMANCE.md, video host
//     pipeline).
//
// Exposed through ctypes (vtc_tpu/data/native.py); the Python segment
// reader (vtc_tpu/data/video.py) keeps identical frame-selection semantics
// across this and the OpenCV fallback.
//
// Build: g++ -O3 -shared -fPIC -o libvtc_decode.so vtc_decode.cpp \
//          -lavformat -lavcodec -lavutil -lswscale

extern "C" {
#include <libavcodec/avcodec.h>
#include <libavformat/avformat.h>
#include <libavutil/imgutils.h>
#include <libswscale/swscale.h>
}

#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

struct Demux {
  AVFormatContext* fmt = nullptr;
  AVCodecContext* dec = nullptr;
  int stream = -1;

  ~Demux() {
    if (dec) avcodec_free_context(&dec);
    if (fmt) avformat_close_input(&fmt);
  }

  // 0 on success, negative on failure.
  int open(const char* path, int threads) {
    if (avformat_open_input(&fmt, path, nullptr, nullptr) < 0) return -1;
    if (avformat_find_stream_info(fmt, nullptr) < 0) return -2;
    const AVCodec* codec = nullptr;
    stream = av_find_best_stream(fmt, AVMEDIA_TYPE_VIDEO, -1, -1, &codec, 0);
    if (stream < 0 || !codec) return -3;
    dec = avcodec_alloc_context3(codec);
    if (!dec) return -4;
    if (avcodec_parameters_to_context(dec, fmt->streams[stream]->codecpar) < 0)
      return -5;
    dec->thread_count = threads > 0 ? threads : 1;
    if (avcodec_open2(dec, codec, nullptr) < 0) return -6;
    return 0;
  }

  double pts_seconds(const AVFrame* frame) const {
    int64_t ts = frame->best_effort_timestamp;
    if (ts == AV_NOPTS_VALUE) ts = frame->pts;
    if (ts == AV_NOPTS_VALUE) return -1.0;
    return ts * av_q2d(fmt->streams[stream]->time_base);
  }
};

// Convert one decoded frame to packed RGB24 [out_h, out_w, 3].
int convert_frame(SwsContext*& sws, const AVFrame* frame, uint8_t* dst,
                  int out_w, int out_h) {
  sws = sws_getCachedContext(sws, frame->width, frame->height,
                             static_cast<AVPixelFormat>(frame->format), out_w,
                             out_h, AV_PIX_FMT_RGB24, SWS_AREA, nullptr,
                             nullptr, nullptr);
  if (!sws) return -1;
  uint8_t* planes[4] = {dst, nullptr, nullptr, nullptr};
  int strides[4] = {out_w * 3, 0, 0, 0};
  sws_scale(sws, frame->data, frame->linesize, 0, frame->height, planes,
            strides);
  return 0;
}

}  // namespace

extern "C" {

// Stream metadata without decoding. Returns 0 on success.
int vtc_probe(const char* path, int* width, int* height, double* fps,
              double* duration_sec, int64_t* nb_frames) {
  Demux d;
  int rc = d.open(path, 1);
  if (rc < 0) return rc;
  AVStream* st = d.fmt->streams[d.stream];
  *width = st->codecpar->width;
  *height = st->codecpar->height;
  AVRational fr = av_guess_frame_rate(d.fmt, st, nullptr);
  *fps = fr.num > 0 && fr.den > 0 ? av_q2d(fr) : 0.0;
  *duration_sec =
      d.fmt->duration != AV_NOPTS_VALUE ? d.fmt->duration / 1e6 : 0.0;
  *nb_frames = st->nb_frames;  // 0 when the container doesn't record it
  return 0;
}

// Decode the segment [start_sec, end_sec] of the first video stream into
// packed RGB24 frames of (out_w, out_h).
//
//   end_sec < 0      : no end limit (decode to EOF)
//   subsample_to > 0 : floor-linspace select that many frames over the
//                      decoded segment (identical selection to decoding all
//                      then indexing); only the selected frames are
//                      colorspace-converted/resized
//   max_frames > 0   : stop decoding after that many in-range frames
//   cap_frames       : capacity of `out` in frames (hard output bound)
//
// Returns the number of frames written to `out`, or negative on error.
int vtc_decode_segment(const char* path, double start_sec, double end_sec,
                       int out_w, int out_h, int subsample_to, int max_frames,
                       int threads, uint8_t* out, int cap_frames) {
  if (out_w <= 0 || out_h <= 0 || cap_frames <= 0) return -100;
  Demux d;
  int rc = d.open(path, threads);
  if (rc < 0) return rc;
  AVStream* st = d.fmt->streams[d.stream];

  if (start_sec > 0) {
    int64_t ts = static_cast<int64_t>(start_sec / av_q2d(st->time_base));
    // land on the keyframe at-or-before start; in-range filtering below
    // drops the lead-in frames (same semantics as the OpenCV MSEC seek)
    if (av_seek_frame(d.fmt, d.stream, ts, AVSEEK_FLAG_BACKWARD) < 0) {
      // unseekable container: decode from the top, filter by pts
    }
  }

  const size_t frame_bytes = static_cast<size_t>(out_w) * out_h * 3;
  // subsample path: hold refs to the native YUV frames, convert after
  // selection. For large frames (>1MP) buffering the segment costs GBs, so
  // convert-as-we-go into out-sized RGB instead (same trade the OpenCV
  // path makes; per-frame processing commutes with frame selection).
  bool buffer_refs =
      subsample_to > 0 &&
      static_cast<int64_t>(st->codecpar->width) * st->codecpar->height <=
          1'000'000;
  std::vector<AVFrame*> kept;           // buffered YUV refs
  std::vector<uint8_t> staged;          // converted RGB (subsample, big frames)
  int n_inrange = 0;                    // frames seen inside [start, end]
  int n_written = 0;                    // frames in `out` (direct path)
  bool done = false;

  SwsContext* sws = nullptr;
  AVPacket* pkt = av_packet_alloc();
  AVFrame* frame = av_frame_alloc();
  int err = 0;

  auto handle_frame = [&](AVFrame* f) {
    double pts = d.pts_seconds(f);
    if (pts >= 0 && pts < start_sec - 1e-9) return;        // seek lead-in
    if (end_sec >= 0 && pts > end_sec + 1e-9) {            // past segment
      done = true;
      return;
    }
    ++n_inrange;
    if (subsample_to > 0) {
      if (buffer_refs) {
        kept.push_back(av_frame_clone(f));
      } else {
        staged.resize(staged.size() + frame_bytes);
        if (convert_frame(sws, f, staged.data() + staged.size() - frame_bytes,
                          out_w, out_h) < 0)
          err = -7;
      }
    } else {
      if (n_written < cap_frames) {
        if (convert_frame(sws, f, out + n_written * frame_bytes, out_w,
                          out_h) < 0)
          err = -7;
        else
          ++n_written;
      }
      if (n_written >= cap_frames) done = true;
    }
    if (max_frames > 0 && n_inrange >= max_frames) done = true;
  };

  while (!done && err == 0 && av_read_frame(d.fmt, pkt) >= 0) {
    if (pkt->stream_index == d.stream &&
        avcodec_send_packet(d.dec, pkt) >= 0) {
      while (err == 0 && avcodec_receive_frame(d.dec, frame) >= 0) {
        handle_frame(frame);
        if (done) break;
      }
    }
    av_packet_unref(pkt);
  }
  if (!done && err == 0) {  // drain delayed frames
    avcodec_send_packet(d.dec, nullptr);
    while (!done && err == 0 && avcodec_receive_frame(d.dec, frame) >= 0)
      handle_frame(frame);
  }

  if (err == 0 && subsample_to > 0 && n_inrange > 0) {
    int navail = buffer_refs ? static_cast<int>(kept.size())
                             : static_cast<int>(staged.size() / frame_bytes);
    int nout = subsample_to < cap_frames ? subsample_to : cap_frames;
    // floor-linspace, mirroring np.linspace's arithmetic exactly
    // (precomputed step, endpoint forced) — must match
    // video.py:linspace_subsample index-for-index
    double step =
        nout > 1 ? static_cast<double>(navail - 1) / (nout - 1) : 0.0;
    for (int i = 0; i < nout && err == 0; ++i) {
      double x = i == nout - 1 ? static_cast<double>(navail - 1) : i * step;
      int idx = static_cast<int>(std::floor(x));
      if (buffer_refs) {
        if (convert_frame(sws, kept[idx], out + i * frame_bytes, out_w,
                          out_h) < 0)
          err = -7;
      } else {
        std::memcpy(out + i * frame_bytes, staged.data() + idx * frame_bytes,
                    frame_bytes);
      }
    }
    n_written = err == 0 ? nout : 0;
  }

  for (AVFrame* f : kept) av_frame_free(&f);
  av_frame_free(&frame);
  av_packet_free(&pkt);
  if (sws) sws_freeContext(sws);
  return err < 0 ? err : n_written;
}

}  // extern "C"
