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
// Segment endpoints are ABSOLUTE stream pts, matching the reference's
// torchvision reader (`_read_video_from_file(video_pts_range=...)`) — the
// reference compensates container start offsets in dataset code (the
// reddit 1.4 s case, dataset_loaders.py:362-372), so this worker must NOT
// re-base to start_time. The Python caller aligns the OpenCV fallback
// (whose CAP_PROP_POS_MSEC is start_time-relative) using the probed
// start_time (vtc_tpu/data/video.py).
//
// The handle API (vtc_open / vtc_handle_*) demuxes+initializes the codec
// ONCE per file; info queries and repeated segment decodes reuse it —
// the host pipeline here is explicitly single-core, so per-item
// avformat_open_input/find_stream_info/codec-init duplication is pure
// decode-wall overhead.
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
#include <new>
#include <vector>

namespace {

struct Demux {
  AVFormatContext* fmt = nullptr;
  AVCodecContext* dec = nullptr;
  SwsContext* sws = nullptr;
  int stream = -1;
  bool dirty = false;  // a decode ran: the next one must seek+flush

  ~Demux() {
    if (sws) sws_freeContext(sws);
    if (dec) avcodec_free_context(&dec);
    if (fmt) avformat_close_input(&fmt);
  }

  // 0 on success, negative on failure. with_codec=false stops after
  // stream discovery (metadata-only probes never pay codec init).
  int open(const char* path, int threads, bool with_codec) {
    if (avformat_open_input(&fmt, path, nullptr, nullptr) < 0) return -1;
    if (avformat_find_stream_info(fmt, nullptr) < 0) return -2;
    const AVCodec* codec = nullptr;
    stream = av_find_best_stream(fmt, AVMEDIA_TYPE_VIDEO, -1, -1, &codec, 0);
    if (stream < 0 || !codec) return -3;
    if (!with_codec) return 0;
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

  void info(int* width, int* height, double* fps, double* duration_sec,
            int64_t* nb_frames, double* start_sec) const {
    AVStream* st = fmt->streams[stream];
    *width = st->codecpar->width;
    *height = st->codecpar->height;
    AVRational fr = av_guess_frame_rate(fmt, st, nullptr);
    *fps = fr.num > 0 && fr.den > 0 ? av_q2d(fr) : 0.0;
    *duration_sec =
        fmt->duration != AV_NOPTS_VALUE ? fmt->duration / 1e6 : 0.0;
    *nb_frames = st->nb_frames;  // 0 when the container doesn't record it
    if (st->start_time != AV_NOPTS_VALUE)
      *start_sec = st->start_time * av_q2d(st->time_base);
    else if (fmt->start_time != AV_NOPTS_VALUE)
      *start_sec = fmt->start_time / 1e6;
    else
      *start_sec = 0.0;
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

// Decode [start_sec, end_sec] (absolute pts) on an open handle. Returns the
// number of frames written to `out`, or negative on error. Repeatable: the
// demuxer is re-seeked and the decoder flushed between calls.
int decode_on(Demux& d, double start_sec, double end_sec, int out_w,
              int out_h, int subsample_to, int max_frames, uint8_t* out,
              int cap_frames) {
  if (out_w <= 0 || out_h <= 0 || cap_frames <= 0 || !d.dec) return -100;
  AVStream* st = d.fmt->streams[d.stream];

  if (start_sec > 0 || d.dirty) {
    int64_t ts = static_cast<int64_t>(start_sec / av_q2d(st->time_base));
    // land on the keyframe at-or-before start; in-range filtering below
    // drops the lead-in frames. An unseekable container on a fresh handle
    // just decodes from the top (filtering still applies); on a reused
    // handle it is a hard error — the stream position is undefined.
    if (av_seek_frame(d.fmt, d.stream, ts, AVSEEK_FLAG_BACKWARD) < 0 &&
        d.dirty)
      return -9;
    avcodec_flush_buffers(d.dec);
  }
  d.dirty = true;

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

  AVPacket* pkt = av_packet_alloc();
  AVFrame* frame = av_frame_alloc();
  int err = (!pkt || !frame) ? -8 : 0;

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
        AVFrame* ref = av_frame_clone(f);
        if (!ref) {
          err = -8;  // allocation failure under memory pressure
          return;
        }
        kept.push_back(ref);
      } else {
        staged.resize(staged.size() + frame_bytes);
        if (convert_frame(d.sws, f,
                          staged.data() + staged.size() - frame_bytes, out_w,
                          out_h) < 0)
          err = -7;
      }
    } else {
      if (n_written < cap_frames) {
        if (convert_frame(d.sws, f, out + n_written * frame_bytes, out_w,
                          out_h) < 0)
          err = -7;
        else
          ++n_written;
      }
      if (n_written >= cap_frames) done = true;
    }
    if (max_frames > 0 && n_inrange >= max_frames) done = true;
  };

  // distinguishes "decoded frames, none in [start, end]" (a legitimately
  // empty segment, return 0) from "the decoder produced NOTHING" (corrupt /
  // unsupported bitstream this libav demuxes but cannot decode — return an
  // error so the caller's fallback decoder gets a try)
  long n_decoded = 0;

  while (!done && err == 0 && av_read_frame(d.fmt, pkt) >= 0) {
    if (pkt->stream_index == d.stream &&
        avcodec_send_packet(d.dec, pkt) >= 0) {
      while (err == 0 && avcodec_receive_frame(d.dec, frame) >= 0) {
        ++n_decoded;
        handle_frame(frame);
        if (done) break;
      }
    }
    av_packet_unref(pkt);
  }
  if (!done && err == 0) {  // drain delayed frames
    avcodec_send_packet(d.dec, nullptr);
    while (!done && err == 0 && avcodec_receive_frame(d.dec, frame) >= 0) {
      ++n_decoded;
      handle_frame(frame);
    }
  }
  if (err == 0 && n_decoded == 0) err = -10;  // nothing decodable at all

  if (err == 0 && subsample_to > 0 && n_inrange > 0) {
    int navail = buffer_refs ? static_cast<int>(kept.size())
                             : static_cast<int>(staged.size() / frame_bytes);
    int nout = subsample_to < cap_frames ? subsample_to : cap_frames;
    // floor-linspace, mirroring np.linspace's arithmetic exactly
    // (precomputed step; endpoint forced only when nout > 1 —
    // np.linspace(0, n-1, 1) is [0., ...] so nout==1 selects the FIRST
    // frame) — must match video.py:linspace_subsample index-for-index
    double step =
        nout > 1 ? static_cast<double>(navail - 1) / (nout - 1) : 0.0;
    for (int i = 0; i < nout && err == 0; ++i) {
      double x = (nout > 1 && i == nout - 1)
                     ? static_cast<double>(navail - 1)
                     : i * step;
      int idx = static_cast<int>(std::floor(x));
      if (buffer_refs) {
        if (convert_frame(d.sws, kept[idx], out + i * frame_bytes, out_w,
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
  return err < 0 ? err : n_written;
}

}  // namespace

extern "C" {

// Stream metadata without opening (or paying for) a decoder.
// start_sec reports the container/stream start offset in seconds — the
// OpenCV fallback needs it to convert absolute segment endpoints to its
// start_time-relative CAP_PROP_POS_MSEC domain. Returns 0 on success.
int vtc_probe(const char* path, int* width, int* height, double* fps,
              double* duration_sec, int64_t* nb_frames, double* start_sec) {
  Demux d;
  int rc = d.open(path, 1, /*with_codec=*/false);
  if (rc < 0) return rc;
  d.info(width, height, fps, duration_sec, nb_frames, start_sec);
  return 0;
}

// Open a decode handle (demuxer + codec, initialized once). NULL on failure.
void* vtc_open(const char* path, int threads) {
  Demux* d = new (std::nothrow) Demux();
  if (!d) return nullptr;
  if (d->open(path, threads, /*with_codec=*/true) < 0) {
    delete d;
    return nullptr;
  }
  return d;
}

int vtc_handle_info(void* handle, int* width, int* height, double* fps,
                    double* duration_sec, int64_t* nb_frames,
                    double* start_sec) {
  if (!handle) return -100;
  static_cast<Demux*>(handle)->info(width, height, fps, duration_sec,
                                    nb_frames, start_sec);
  return 0;
}

// Decode the segment [start_sec, end_sec] (ABSOLUTE stream pts) into packed
// RGB24 frames of (out_w, out_h). Repeatable on one handle (seek + flush).
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
int vtc_handle_decode(void* handle, double start_sec, double end_sec,
                      int out_w, int out_h, int subsample_to, int max_frames,
                      uint8_t* out, int cap_frames) {
  if (!handle) return -100;
  return decode_on(*static_cast<Demux*>(handle), start_sec, end_sec, out_w,
                   out_h, subsample_to, max_frames, out, cap_frames);
}

void vtc_close(void* handle) { delete static_cast<Demux*>(handle); }

// One-shot convenience wrapper (open → decode → close).
int vtc_decode_segment(const char* path, double start_sec, double end_sec,
                       int out_w, int out_h, int subsample_to, int max_frames,
                       int threads, uint8_t* out, int cap_frames) {
  Demux d;
  int rc = d.open(path, threads, /*with_codec=*/true);
  if (rc < 0) return rc;
  return decode_on(d, start_sec, end_sec, out_w, out_h, subsample_to,
                   max_frames, out, cap_frames);
}

}  // extern "C"
