// avstage: native batch-staging runtime for the TPU input pipeline.
//
// The reference delegates its hot host-side loop (decode -> crop -> segment
// gather -> tensor assembly) to torch/ffmpeg native code inside dataloader
// workers. Here the equivalent sits in one small C++ library driven from the
// Python pipeline via ctypes:
//
//   - aligned slot allocation for reusable batch buffers (stable addresses,
//     zero per-batch allocation, friendly to dma_map/pinning layers above)
//   - multi-threaded segment gather: (T, H, W, C) uint8 frames -> fixed-shape
//     (S, seg, h, w, C) crops, and (Ta,) float PCM -> (S, seg_a) windows
//   - int16 -> float32 PCM conversion
//
// All entry points release the GIL by construction (pure C ABI, no Python).
// Build: make -C native/avstage  (g++ -O3 -shared -fPIC -pthread)

#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <thread>
#include <vector>

extern "C" {

// 64-byte-aligned allocation for batch slots
void* avstage_alloc(size_t bytes) {
    void* p = nullptr;
    if (posix_memalign(&p, 64, bytes) != 0) return nullptr;
    return p;
}

void avstage_free(void* p) { free(p); }

int avstage_hw_threads() {
    unsigned n = std::thread::hardware_concurrency();
    return n == 0 ? 4 : static_cast<int>(n);
}

// Gather video segments with spatial crop:
//   src: (T, H, W, C) uint8, contiguous
//   dst: (S, seg_len, crop_h, crop_w, C) uint8, contiguous
//   starts: (S,) int64 first frame of each segment
// The crop window starts at (crop_i, crop_j). Rows are copied with memcpy;
// segments are distributed over a thread pool.
void avstage_gather_video_u8(const uint8_t* src, int64_t T, int64_t H, int64_t W,
                             int64_t C, const int64_t* starts, int64_t S,
                             int64_t seg_len, int64_t crop_i, int64_t crop_j,
                             int64_t crop_h, int64_t crop_w, uint8_t* dst,
                             int num_threads) {
    const int64_t src_frame = H * W * C;
    const int64_t src_row = W * C;
    const int64_t dst_row = crop_w * C;
    const int64_t dst_frame = crop_h * dst_row;
    const int64_t dst_seg = seg_len * dst_frame;

    auto work = [&](int64_t s_begin, int64_t s_end) {
        for (int64_t s = s_begin; s < s_end; ++s) {
            const int64_t f0 = starts[s];
            for (int64_t f = 0; f < seg_len; ++f) {
                const uint8_t* sf = src + (f0 + f) * src_frame +
                                    crop_i * src_row + crop_j * C;
                uint8_t* df = dst + s * dst_seg + f * dst_frame;
                for (int64_t r = 0; r < crop_h; ++r)
                    memcpy(df + r * dst_row, sf + r * src_row, dst_row);
            }
        }
    };

    int nt = num_threads > 0 ? num_threads : avstage_hw_threads();
    if (nt <= 1 || S <= 1) { work(0, S); return; }
    nt = static_cast<int>(S < nt ? S : nt);
    std::vector<std::thread> pool;
    const int64_t per = (S + nt - 1) / nt;
    for (int t = 0; t < nt; ++t) {
        int64_t b = t * per, e = b + per < S ? b + per : S;
        if (b >= e) break;
        pool.emplace_back(work, b, e);
    }
    for (auto& th : pool) th.join();
}

// Patchify frames for the dense patch embed (host-side im2col of the 3D
// patch conv; see synchformer_tpu/ops/video.py::patchify_frames):
//   src: (N, T, H, W, C) uint8, contiguous   (N = B*S folded)
//   dst: (N, T/z, (H/p)*(W/p), z*p*p*C) uint8, contiguous
// Patch vector order (z, ph, pw, c) matches the conv kernel's
// (z, p, p, c, D) flatten. Inner unit is a p*C-byte row memcpy; work is
// distributed over (N) units on the thread pool.
void avstage_patchify_u8(const uint8_t* src, int64_t N, int64_t T, int64_t H,
                         int64_t W, int64_t C, int64_t z, int64_t p,
                         uint8_t* dst, int num_threads) {
    const int64_t f = T / z, gh = H / p, gw = W / p;
    const int64_t row = p * C;                 // one patch row
    const int64_t patch = z * p * row;         // z*p*p*C patch vector
    const int64_t src_row = W * C;
    const int64_t src_frame = H * src_row;
    const int64_t src_item = T * src_frame;
    const int64_t dst_item = f * gh * gw * patch;

    auto work = [&](int64_t n_begin, int64_t n_end) {
        for (int64_t n = n_begin; n < n_end; ++n) {
            const uint8_t* s0 = src + n * src_item;
            uint8_t* d0 = dst + n * dst_item;
            // dst-contiguous order: each (gx) patch vector is written front
            // to back (reads stride one frame row, stays in-page)
            for (int64_t fi = 0; fi < f; ++fi)
                for (int64_t gy = 0; gy < gh; ++gy) {
                    const uint8_t* sblk = s0 + fi * z * src_frame
                        + gy * p * src_row;
                    uint8_t* dblk = d0 + (fi * gh + gy) * gw * patch;
                    for (int64_t gx = 0; gx < gw; ++gx) {
                        uint8_t* dp = dblk + gx * patch;
                        for (int64_t dz = 0; dz < z; ++dz)
                            for (int64_t py = 0; py < p; ++py)
                                memcpy(dp + (dz * p + py) * row,
                                       sblk + dz * src_frame + py * src_row
                                           + gx * row,
                                       row);
                    }
                }
        }
    };

    int nt = num_threads > 0 ? num_threads : avstage_hw_threads();
    if (nt <= 1 || N <= 1) { work(0, N); return; }
    nt = static_cast<int>(N < nt ? N : nt);
    std::vector<std::thread> pool;
    const int64_t per = (N + nt - 1) / nt;
    for (int t = 0; t < nt; ++t) {
        int64_t b = t * per, e = b + per < N ? b + per : N;
        if (b >= e) break;
        pool.emplace_back(work, b, e);
    }
    for (auto& th : pool) th.join();
}

// Gather audio segments: src (Ta,) f32 -> dst (S, seg_len) f32
void avstage_gather_audio_f32(const float* src, const int64_t* starts, int64_t S,
                              int64_t seg_len, float* dst) {
    for (int64_t s = 0; s < S; ++s)
        memcpy(dst + s * seg_len, src + starts[s], seg_len * sizeof(float));
}

// int16 PCM -> float32 in [-1, 1)
void avstage_pcm16_to_f32(const int16_t* src, float* dst, int64_t n) {
    constexpr float k = 1.0f / 32768.0f;
    for (int64_t i = 0; i < n; ++i) dst[i] = src[i] * k;
}

// Mean-downmix interleaved multichannel int16 PCM -> mono float32
void avstage_pcm16_downmix_f32(const int16_t* src, float* dst, int64_t frames,
                               int64_t channels) {
    const float k = 1.0f / (32768.0f * static_cast<float>(channels));
    for (int64_t i = 0; i < frames; ++i) {
        int32_t acc = 0;
        for (int64_t c = 0; c < channels; ++c) acc += src[i * channels + c];
        dst[i] = acc * k;
    }
}

}  // extern "C"
