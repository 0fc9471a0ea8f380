// Native host-side person-crop engine.
//
// The reference offloads person-crop preprocessing to cv2.warpAffine inside
// torch DataLoader worker processes (simple_transform.py:81-98) and ships
// CUDA/C++ extensions for its other native needs.  This library is the
// TPU-build's native data-path component: a batched, multithreaded,
// bit-exact replication of cv2.warpAffine(..., INTER_LINEAR,
// BORDER_CONSTANT(0)) for uint8 RGB frames, used by the parity data loader
// when cv2-identical crops are required (cv2 quantizes bilinear weights to
// 5-bit fixed point; float bilinear on device differs by up to ~4/255).
//
// Fixed-point scheme (OpenCV imgproc/warp):
//   AB_BITS = 10, INTER_BITS = 5, coefficients scaled by 2^15,
//   rounding delta AB_SCALE/INTER_TAB_SIZE/2 = 16,
//   output = saturate((c00*p00 + c01*p01 + c10*p10 + c11*p11 + 2^14) >> 15).

#include <cstdint>
#include <cstring>
#include <algorithm>
#include <cmath>
#include <thread>
#include <vector>

namespace {

constexpr int AB_BITS = 10;
constexpr int AB_SCALE = 1 << AB_BITS;
constexpr int INTER_BITS = 5;
constexpr int INTER_TAB_SIZE = 1 << INTER_BITS;   // 32
constexpr int ROUND_DELTA = AB_SCALE / INTER_TAB_SIZE / 2;  // 16
constexpr int COEF_BITS = 15;

inline int saturate_i32(double v) {
    // saturate_cast<int>(double): rint with clamping
    double r = std::nearbyint(v);
    if (r >= 2147483647.0) return 2147483647;
    if (r <= -2147483648.0) return -2147483648;
    return static_cast<int>(r);
}

inline uint8_t saturate_u8(int v) {
    return static_cast<uint8_t>(v < 0 ? 0 : (v > 255 ? 255 : v));
}

// Invert a forward 2x3 affine (src->dst) into dst->src, like cv2's
// invertAffineTransform (double precision).
void invert_affine(const double M[6], double iM[6]) {
    double D = M[0] * M[4] - M[1] * M[3];
    D = D != 0 ? 1.0 / D : 0.0;
    double A11 = M[4] * D, A22 = M[0] * D;
    double A12 = -M[1] * D, A21 = -M[3] * D;
    double b1 = -A11 * M[2] - A12 * M[5];
    double b2 = -A21 * M[2] - A22 * M[5];
    iM[0] = A11; iM[1] = A12; iM[2] = b1;
    iM[3] = A21; iM[4] = A22; iM[5] = b2;
}

// Float path: modern cv2 (>=5.x / 4.10+ new warp kernels) interpolates with
// unquantized float32 fractions and rounds half-to-even.
void warp_one_float(const uint8_t* src, int sh, int sw, int channels,
                    const double fwdM[6], uint8_t* dst, int dh, int dw) {
    double iM[6];
    invert_affine(fwdM, iM);
    const float m0 = static_cast<float>(iM[0]), m1 = static_cast<float>(iM[1]),
                m2 = static_cast<float>(iM[2]), m3 = static_cast<float>(iM[3]),
                m4 = static_cast<float>(iM[4]), m5 = static_cast<float>(iM[5]);
    for (int y = 0; y < dh; ++y) {
        uint8_t* drow = dst + static_cast<size_t>(y) * dw * channels;
        for (int x = 0; x < dw; ++x) {
            float tx = m0 * x + m1 * y + m2;
            float ty = m3 * x + m4 * y + m5;
            float fx0 = std::floor(tx), fy0 = std::floor(ty);
            int sx = static_cast<int>(fx0), sy = static_cast<int>(fy0);
            float fx = tx - fx0, fy = ty - fy0;
            for (int c = 0; c < channels; ++c) {
                auto tap = [&](int yy, int xx) -> float {
                    if (xx < 0 || xx >= sw || yy < 0 || yy >= sh) return 0.f;
                    return src[(static_cast<size_t>(yy) * sw + xx)
                               * channels + c];
                };
                float v = (1 - fy) * ((1 - fx) * tap(sy, sx)
                                      + fx * tap(sy, sx + 1))
                        + fy * ((1 - fx) * tap(sy + 1, sx)
                                + fx * tap(sy + 1, sx + 1));
                int r = static_cast<int>(std::nearbyint(v));
                drow[x * channels + c] = saturate_u8(r);
            }
        }
    }
}

void warp_one(const uint8_t* src, int sh, int sw, int channels,
              const double fwdM[6], uint8_t* dst, int dh, int dw) {
    double iM[6];
    invert_affine(fwdM, iM);

    std::vector<int> adelta(dw), bdelta(dw);
    for (int x = 0; x < dw; ++x) {
        adelta[x] = saturate_i32(iM[0] * x * AB_SCALE);
        bdelta[x] = saturate_i32(iM[3] * x * AB_SCALE);
    }

    for (int y = 0; y < dh; ++y) {
        int X0 = saturate_i32((iM[1] * y + iM[2]) * AB_SCALE) + ROUND_DELTA;
        int Y0 = saturate_i32((iM[4] * y + iM[5]) * AB_SCALE) + ROUND_DELTA;
        uint8_t* drow = dst + static_cast<size_t>(y) * dw * channels;
        for (int x = 0; x < dw; ++x) {
            int X = (X0 + adelta[x]) >> (AB_BITS - INTER_BITS);
            int Y = (Y0 + bdelta[x]) >> (AB_BITS - INTER_BITS);
            int sx = X >> INTER_BITS, sy = Y >> INTER_BITS;
            int fx = X & (INTER_TAB_SIZE - 1), fy = Y & (INTER_TAB_SIZE - 1);
            // coefficient table values are exact integers: k*32
            int c00 = (INTER_TAB_SIZE - fy) * (INTER_TAB_SIZE - fx) * 32;
            int c01 = (INTER_TAB_SIZE - fy) * fx * 32;
            int c10 = fy * (INTER_TAB_SIZE - fx) * 32;
            int c11 = fy * fx * 32;
            for (int c = 0; c < channels; ++c) {
                auto tap = [&](int yy, int xx) -> int {
                    if (xx < 0 || xx >= sw || yy < 0 || yy >= sh) return 0;
                    return src[(static_cast<size_t>(yy) * sw + xx)
                               * channels + c];
                };
                int acc = c00 * tap(sy, sx) + c01 * tap(sy, sx + 1)
                        + c10 * tap(sy + 1, sx) + c11 * tap(sy + 1, sx + 1);
                // cv2 4.x rounds the 2^-15 fixed-point result half-to-even
                int base = acc >> COEF_BITS;
                int rem = acc & ((1 << COEF_BITS) - 1);
                int half = 1 << (COEF_BITS - 1);
                base += (rem > half) || (rem == half && (base & 1));
                drow[x * channels + c] = saturate_u8(base);
            }
        }
    }
}

}  // namespace

extern "C" {

// Batched crop: frames (F, sh, sw, C) uint8; frame_idx (N,); mats (N, 6)
// forward 2x3 affines (src->dst, cv2 convention); out (N, dh, dw, C).
// mode 0: classic cv2 (<=4.x) 5-bit fixed-point bilinear;
// mode 1: modern cv2 (>=5.x) float32 bilinear, round-half-even.
void warp_affine_batch(const uint8_t* frames, int num_frames, int sh, int sw,
                       int channels, const int32_t* frame_idx,
                       const double* mats, int n, uint8_t* out, int dh,
                       int dw, int num_threads, int mode) {
    const size_t frame_sz = static_cast<size_t>(sh) * sw * channels;
    const size_t out_sz = static_cast<size_t>(dh) * dw * channels;
    auto work = [&](int begin, int end) {
        for (int i = begin; i < end; ++i) {
            int f = frame_idx[i];
            if (f < 0 || f >= num_frames) continue;
            if (mode == 1)
                warp_one_float(frames + frame_sz * f, sh, sw, channels,
                               mats + 6 * i, out + out_sz * i, dh, dw);
            else
                warp_one(frames + frame_sz * f, sh, sw, channels,
                         mats + 6 * i, out + out_sz * i, dh, dw);
        }
    };
    if (num_threads <= 1 || n <= 1) {
        work(0, n);
        return;
    }
    int nt = std::min(num_threads, n);
    std::vector<std::thread> threads;
    int per = (n + nt - 1) / nt;
    for (int t = 0; t < nt; ++t) {
        int b = t * per, e = std::min(n, b + per);
        if (b < e) threads.emplace_back(work, b, e);
    }
    for (auto& th : threads) th.join();
}

}  // extern "C"
