// recnext_io — native image-decoding/resizing core for the input pipeline.
//
// The reference's data loader rides torch's C++ DataLoader + PIL workers
// (/root/reference/main.py:242-259, 10 workers). This is the TPU build's native
// counterpart: libjpeg decode with DCT-domain prescaling, fused PIL-convention
// antialiased bicubic/bilinear crop-resize + horizontal flip + mean/std
// normalization straight into a float32
// NHWC batch buffer, fanned out over a std::thread pool. Exposed via a C ABI and
// bound with ctypes (recnext_tpu/data/native.py) — no pybind11 dependency.
//
// Build: g++ -O3 -march=native -shared -fPIC recnext_io.cpp -o librecnext_io.so -ljpeg -lpthread

#include <cstddef>
#include <cstdio>

#include <jpeglib.h>

#include <algorithm>
#include <atomic>
#include <cmath>
#include <csetjmp>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

namespace {

struct JpegErr {
    jpeg_error_mgr mgr;
    jmp_buf jb;
};

void jpeg_err_exit(j_common_ptr cinfo) {
    JpegErr* e = reinterpret_cast<JpegErr*>(cinfo->err);
    longjmp(e->jb, 1);
}

// Decode a JPEG from memory into an RGB8 buffer. Uses libjpeg's DCT scaling
// (scale 1/1..1/8) so large photos decode near the target size instead of at
// full resolution. Returns 0 on success.
int decode_jpeg_rgb(const uint8_t* data, size_t len, int min_side,
                    std::vector<uint8_t>& out, int* out_w, int* out_h) {
    jpeg_decompress_struct cinfo;
    JpegErr jerr;
    cinfo.err = jpeg_std_error(&jerr.mgr);
    jerr.mgr.error_exit = jpeg_err_exit;
    if (setjmp(jerr.jb)) {
        jpeg_destroy_decompress(&cinfo);
        return 1;
    }
    jpeg_create_decompress(&cinfo);
    jpeg_mem_src(&cinfo, data, len);
    jpeg_read_header(&cinfo, TRUE);
    cinfo.out_color_space = JCS_RGB;

    if (min_side > 0) {
        // largest denominator that keeps min(w,h)/denom >= min_side
        int denom = 1;
        int short_side = std::min<int>(cinfo.image_width, cinfo.image_height);
        while (denom < 8 && short_side / (denom * 2) >= min_side) denom *= 2;
        cinfo.scale_num = 1;
        cinfo.scale_denom = denom;
    }
    jpeg_start_decompress(&cinfo);
    const int w = cinfo.output_width, h = cinfo.output_height;
    out.resize(static_cast<size_t>(w) * h * 3);
    const int stride = w * 3;
    while (cinfo.output_scanline < cinfo.output_height) {
        uint8_t* row = out.data() + static_cast<size_t>(cinfo.output_scanline) * stride;
        jpeg_read_scanlines(&cinfo, &row, 1);
    }
    jpeg_finish_decompress(&cinfo);
    jpeg_destroy_decompress(&cinfo);
    *out_w = w;
    *out_h = h;
    return 0;
}

// PIL-convention antialiased separable resampling (Pillow's ImagingResample):
// per output pixel the kernel support scales with the downsampling factor, the
// contribution window is clamped to the image and its weights renormalized.
// filter 0 = bilinear (triangle, support 1), 1 = bicubic (a = -0.5, support 2 —
// the reference eval transform's resample, /root/reference/data/datasets.py:130).
inline float kern_bilinear(float x) {
    x = std::fabs(x);
    return x < 1.0f ? 1.0f - x : 0.0f;
}

inline float kern_bicubic(float x) {
    // Keys cubic with a = -0.5 (PIL BICUBIC / Catmull-Rom)
    x = std::fabs(x);
    if (x < 1.0f) return ((1.5f * x - 2.5f) * x) * x + 1.0f;
    if (x < 2.0f) return ((-0.5f * x + 2.5f) * x - 4.0f) * x + 2.0f;
    return 0.0f;
}

// Per-axis contribution windows for resampling a crop of length `crop_len`
// starting at `c0` (in an image axis of `in_size` px) to `out` px. Windows may
// extend past the crop into the rest of the image (clamped at image bounds) —
// the resize-the-full-image-then-crop semantics of the reference eval pipeline.
struct Axis {
    std::vector<int> first;
    std::vector<int> count;
    std::vector<float> wgt;  // out x kmax, row-major
    int kmax = 0;
};

Axis precompute_axis(int in_size, float c0, float crop_len, int out, int filter) {
    const float base_support = filter == 1 ? 2.0f : 1.0f;
    const float scale = crop_len / out;
    const float fscale = std::max(scale, 1.0f);
    const float support = base_support * fscale;
    Axis ax;
    ax.kmax = static_cast<int>(std::ceil(2.0f * support)) + 2;
    ax.first.resize(out);
    ax.count.resize(out);
    ax.wgt.assign(static_cast<size_t>(out) * ax.kmax, 0.0f);
    for (int o = 0; o < out; ++o) {
        const float center = c0 + (o + 0.5f) * scale;
        int xmin = static_cast<int>(std::floor(center - support));
        int xmax = static_cast<int>(std::ceil(center + support));
        xmin = std::max(xmin, 0);
        xmax = std::min(xmax, in_size);
        float* w = ax.wgt.data() + static_cast<size_t>(o) * ax.kmax;
        float sum = 0.0f;
        if (xmax <= xmin) {  // degenerate crop: nearest pixel with full weight
            xmin = std::max(0, std::min(in_size - 1, static_cast<int>(center)));
            xmax = xmin + 1;
            w[0] = 1.0f;
            sum = 1.0f;
        } else {
            for (int x = xmin; x < xmax; ++x) {
                const float k = filter == 1
                    ? kern_bicubic((x + 0.5f - center) / fscale)
                    : kern_bilinear((x + 0.5f - center) / fscale);
                w[x - xmin] = k;
                sum += k;
            }
        }
        if (sum != 0.0f)
            for (int x = 0; x < xmax - xmin; ++x) w[x] /= sum;
        ax.first[o] = xmin;
        ax.count[o] = xmax - xmin;
    }
    return ax;
}

// Fused: crop rectangle (cx, cy, cw, ch — float source coords, so callers can
// express PIL resize-then-crop geometry exactly) from an RGB8 image, resample to
// (size x size) with the PIL-convention antialiased filter, optional horizontal
// flip, then either normalize to (x/255 - mean)/std into float32 HWC (`dst`),
// or — when `dst8` is non-null — round to uint8 HWC the way PIL's resample
// output stage does, for callers that run further PIL-side augmentation
// (RandAugment) on the cropped image before normalizing.
void crop_resize_normalize(const uint8_t* img, int w, int h, float cx, float cy,
                           float cw, float ch, int size, int flip, int filter,
                           const float* mean, const float* stdv, float* dst,
                           uint8_t* dst8 = nullptr) {
    const Axis axx = precompute_axis(w, cx, cw, size, filter);
    const Axis axy = precompute_axis(h, cy, ch, size, filter);
    // vertical extent actually needed for the horizontal pass
    int ymin = h, ymax = 0;
    for (int oy = 0; oy < size; ++oy) {
        ymin = std::min(ymin, axy.first[oy]);
        ymax = std::max(ymax, axy.first[oy] + axy.count[oy]);
    }
    // horizontal pass: (ymax-ymin) rows x size cols x 3
    std::vector<float> tmp(static_cast<size_t>(ymax - ymin) * size * 3);
    for (int y = ymin; y < ymax; ++y) {
        const uint8_t* row = img + static_cast<size_t>(y) * w * 3;
        float* trow = tmp.data() + static_cast<size_t>(y - ymin) * size * 3;
        for (int ox = 0; ox < size; ++ox) {
            const float* kw = axx.wgt.data() + static_cast<size_t>(ox) * axx.kmax;
            const int x0 = axx.first[ox];
            const int cnt = axx.count[ox];
            float acc[3] = {0.0f, 0.0f, 0.0f};
            for (int i = 0; i < cnt; ++i) {
                const uint8_t* p = row + static_cast<size_t>(x0 + i) * 3;
                acc[0] += kw[i] * p[0];
                acc[1] += kw[i] * p[1];
                acc[2] += kw[i] * p[2];
            }
            float* o = trow + static_cast<size_t>(ox) * 3;
            // PIL clamps (and quantizes) to [0, 255] between the two passes;
            // clamp kernel overshoot the same way, skip the quantization
            o[0] = std::max(0.0f, std::min(acc[0], 255.0f));
            o[1] = std::max(0.0f, std::min(acc[1], 255.0f));
            o[2] = std::max(0.0f, std::min(acc[2], 255.0f));
        }
    }
    // vertical pass + flip + normalization
    for (int oy = 0; oy < size; ++oy) {
        const float* kw = axy.wgt.data() + static_cast<size_t>(oy) * axy.kmax;
        const int y0 = axy.first[oy];
        const int cnt = axy.count[oy];
        for (int ox = 0; ox < size; ++ox) {
            const int oxx = flip ? (size - 1 - ox) : ox;
            float acc[3] = {0.0f, 0.0f, 0.0f};
            for (int i = 0; i < cnt; ++i) {
                const float* p = tmp.data() +
                    (static_cast<size_t>(y0 + i - ymin) * size + ox) * 3;
                acc[0] += kw[i] * p[0];
                acc[1] += kw[i] * p[1];
                acc[2] += kw[i] * p[2];
            }
            if (dst8 != nullptr) {
                uint8_t* o = dst8 + (static_cast<size_t>(oy) * size + oxx) * 3;
                for (int c = 0; c < 3; ++c) {
                    const float v = std::max(0.0f, std::min(acc[c], 255.0f));
                    // PIL's output stage: round-half-up to uint8
                    o[c] = static_cast<uint8_t>(v + 0.5f);
                }
            } else {
                float* o = dst + (static_cast<size_t>(oy) * size + oxx) * 3;
                for (int c = 0; c < 3; ++c) {
                    const float v = std::max(0.0f, std::min(acc[c], 255.0f));
                    o[c] = (v / 255.0f - mean[c]) / stdv[c];
                }
            }
        }
    }
}

}  // namespace

extern "C" {

// Decode one JPEG; caller provides a buffer of cap bytes; returns needed size or
// -1 on error. Two-call protocol (query then fill) avoids allocator coupling.
long rn_decode_jpeg(const uint8_t* data, long len, int min_side, uint8_t* out,
                    long cap, int* out_w, int* out_h) {
    std::vector<uint8_t> buf;
    if (decode_jpeg_rgb(data, static_cast<size_t>(len), min_side, buf, out_w, out_h))
        return -1;
    const long need = static_cast<long>(buf.size());
    if (out != nullptr && cap >= need) std::memcpy(out, buf.data(), need);
    return need;
}

// Shared batch driver: decode n JPEGs (concatenated in `data` with
// offsets/lengths), apply the per-sample crop (cx, cy, cw, ch, flip) and write
// either normalized float32 NHWC (`dstf`) or PIL-rounded uint8 NHWC (`dst8`).
// crops: 5 floats per sample (float source coords — exact PIL
// resize-then-crop geometry; flip != 0 flips). filter: 0 bilinear, 1 bicubic
// (both PIL-convention antialiased). Returns #failures.
static int batch_impl(const uint8_t* data, const long* offsets, const long* lengths,
                      int n, const float* crops, int size, int filter,
                      const float* mean, const float* stdv, float* dstf,
                      uint8_t* dst8, int n_threads) {
    std::atomic<int> fails{0};
    std::atomic<int> next{0};
    n_threads = std::max(1, n_threads);
    const size_t px = static_cast<size_t>(size) * size * 3;
    auto worker = [&]() {
        std::vector<uint8_t> buf;
        int w = 0, h = 0;
        for (;;) {
            const int i = next.fetch_add(1);
            if (i >= n) break;
            if (decode_jpeg_rgb(data + offsets[i], static_cast<size_t>(lengths[i]),
                                /*min_side=*/0, buf, &w, &h)) {
                fails.fetch_add(1);
                if (dst8 != nullptr)
                    std::memset(dst8 + static_cast<size_t>(i) * px, 0, px);
                else
                    std::memset(dstf + static_cast<size_t>(i) * px, 0,
                                sizeof(float) * px);
                continue;
            }
            const float* c = crops + i * 5;
            float cx = c[0], cy = c[1], cw = c[2], ch = c[3];
            const int flip = c[4] != 0.0f;
            if (cw <= 0.0f || ch <= 0.0f) {  // sentinel: full image
                cx = cy = 0.0f;
                cw = static_cast<float>(w);
                ch = static_cast<float>(h);
            }
            cx = std::max(0.0f, std::min(cx, static_cast<float>(w - 1)));
            cy = std::max(0.0f, std::min(cy, static_cast<float>(h - 1)));
            cw = std::min(cw, w - cx);
            ch = std::min(ch, h - cy);
            crop_resize_normalize(buf.data(), w, h, cx, cy, cw, ch, size, flip, filter,
                                  mean, stdv,
                                  dstf ? dstf + static_cast<size_t>(i) * px : nullptr,
                                  dst8 ? dst8 + static_cast<size_t>(i) * px : nullptr);
        }
    };
    std::vector<std::thread> threads;
    for (int t = 0; t < n_threads; ++t) threads.emplace_back(worker);
    for (auto& t : threads) t.join();
    return fails.load();
}

int rn_batch_decode_crop(const uint8_t* data, const long* offsets, const long* lengths,
                         int n, const float* crops, int size, int filter,
                         const float* mean, const float* stdv, float* dst,
                         int n_threads) {
    return batch_impl(data, offsets, lengths, n, crops, size, filter, mean, stdv,
                      dst, nullptr, n_threads);
}

// uint8 variant for the training path: decode + RandomResizedCrop + flip fused
// natively, PIL-rounded uint8 out; RandAugment/jitter/normalize stay host-side
// on the already-small (size x size) crop (/root/reference/main.py:242-259's
// worker stack does all of this in PIL at full image size).
int rn_batch_decode_crop_u8(const uint8_t* data, const long* offsets,
                            const long* lengths, int n, const float* crops,
                            int size, int filter, uint8_t* dst, int n_threads) {
    return batch_impl(data, offsets, lengths, n, crops, size, filter, nullptr,
                      nullptr, nullptr, dst, n_threads);
}

int rn_version() { return 3; }

}  // extern "C"
