// recnext_io — native image-decoding/resizing core for the input pipeline.
//
// The reference's data loader rides torch's C++ DataLoader + PIL workers
// (/root/reference/main.py:242-259, 10 workers). This is the TPU build's native
// counterpart: libjpeg decode with DCT-domain prescaling, fused bilinear
// crop-resize + horizontal flip + mean/std normalization straight into a float32
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

// Fused: crop rectangle (cx, cy, cw, ch) from an RGB8 image, bilinearly resize to
// (size x size), optional horizontal flip, normalize to (x/255 - mean)/std,
// write float32 HWC.
void crop_resize_normalize(const uint8_t* img, int w, int h, int cx, int cy, int cw,
                           int ch, int size, int flip, const float* mean,
                           const float* stdv, float* dst) {
    const float sx = static_cast<float>(cw) / size;
    const float sy = static_cast<float>(ch) / size;
    for (int oy = 0; oy < size; ++oy) {
        float fy = (oy + 0.5f) * sy - 0.5f + cy;
        fy = std::max(0.0f, std::min(fy, static_cast<float>(h - 1)));
        const int y0 = static_cast<int>(fy);
        const int y1 = std::min(y0 + 1, h - 1);
        const float wy = fy - y0;
        for (int ox = 0; ox < size; ++ox) {
            const int oxx = flip ? (size - 1 - ox) : ox;
            float fx = (ox + 0.5f) * sx - 0.5f + cx;
            fx = std::max(0.0f, std::min(fx, static_cast<float>(w - 1)));
            const int x0 = static_cast<int>(fx);
            const int x1 = std::min(x0 + 1, w - 1);
            const float wx = fx - x0;
            const uint8_t* p00 = img + (static_cast<size_t>(y0) * w + x0) * 3;
            const uint8_t* p01 = img + (static_cast<size_t>(y0) * w + x1) * 3;
            const uint8_t* p10 = img + (static_cast<size_t>(y1) * w + x0) * 3;
            const uint8_t* p11 = img + (static_cast<size_t>(y1) * w + x1) * 3;
            float* o = dst + (static_cast<size_t>(oy) * size + oxx) * 3;
            for (int c = 0; c < 3; ++c) {
                const float top = p00[c] + (p01[c] - p00[c]) * wx;
                const float bot = p10[c] + (p11[c] - p10[c]) * wx;
                const float v = (top + (bot - top) * wy) / 255.0f;
                o[c] = (v - mean[c]) / stdv[c];
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

// Batch: decode n JPEGs (concatenated in `data` with offsets/lengths), apply the
// per-sample crop (cx, cy, cw, ch, flip) and write normalized float32 NHWC into
// `dst` (n * size * size * 3). crops: 5 ints per sample. Returns #failures.
int rn_batch_decode_crop(const uint8_t* data, const long* offsets, const long* lengths,
                         int n, const int* crops, int size, const float* mean,
                         const float* stdv, float* dst, int n_threads) {
    std::atomic<int> fails{0};
    std::atomic<int> next{0};
    n_threads = std::max(1, n_threads);
    auto worker = [&]() {
        std::vector<uint8_t> buf;
        int w = 0, h = 0;
        for (;;) {
            const int i = next.fetch_add(1);
            if (i >= n) break;
            if (decode_jpeg_rgb(data + offsets[i], static_cast<size_t>(lengths[i]),
                                /*min_side=*/0, buf, &w, &h)) {
                fails.fetch_add(1);
                std::memset(dst + static_cast<size_t>(i) * size * size * 3, 0,
                            sizeof(float) * size * size * 3);
                continue;
            }
            const int* c = crops + i * 5;
            int cx = c[0], cy = c[1], cw = c[2], ch = c[3], flip = c[4];
            if (cw <= 0 || ch <= 0) {  // sentinel: full image
                cx = cy = 0;
                cw = w;
                ch = h;
            }
            cx = std::max(0, std::min(cx, w - 1));
            cy = std::max(0, std::min(cy, h - 1));
            cw = std::min(cw, w - cx);
            ch = std::min(ch, h - cy);
            crop_resize_normalize(buf.data(), w, h, cx, cy, cw, ch, size, flip, mean,
                                  stdv, dst + static_cast<size_t>(i) * size * size * 3);
        }
    };
    std::vector<std::thread> threads;
    for (int t = 0; t < n_threads; ++t) threads.emplace_back(worker);
    for (auto& t : threads) t.join();
    return fails.load();
}

int rn_version() { return 1; }

}  // extern "C"
