// miotts_runtime — native runtime kernels for the host side of the pipeline.
//
// The TPU owns all model compute (JAX/XLA); this library covers the host
// hot paths the reference implements in C++ (GGUF dequantization at model
// load, WAV encode, linear resampling — mio-tts-lib.cpp:758-791,
// wavlm-extractor.cpp:218-240) with multithreaded, vectorizable loops.
// Plain C ABI, consumed from Python via ctypes (no pybind11 in the image).
//
// Build: miotts_tpu/runtime/build_native.py (g++ -O3 -march=native).

#include <algorithm>
#include <atomic>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

extern "C" {

// ---------------------------------------------------------------------------
// half/bfloat conversion
// ---------------------------------------------------------------------------

#if defined(__F16C__) || defined(__aarch64__)
static inline float fp16_to_fp32(uint16_t h) {
    _Float16 f;
    std::memcpy(&f, &h, 2);
    return (float)f;
}
#else
static inline float fp16_to_fp32(uint16_t h) {
    uint32_t sign = (uint32_t)(h & 0x8000) << 16;
    uint32_t exp = (h >> 10) & 0x1F;
    uint32_t mant = h & 0x3FF;
    uint32_t bits;
    if (exp == 0) {
        if (mant == 0) {
            bits = sign;
        } else {
            // subnormal: normalize
            int e = -1;
            do {
                mant <<= 1;
                e++;
            } while (!(mant & 0x400));
            mant &= 0x3FF;
            bits = sign | ((uint32_t)(127 - 15 - e) << 23) | (mant << 13);
        }
    } else if (exp == 31) {
        bits = sign | 0x7F800000u | (mant << 13);
    } else {
        bits = sign | ((exp + 112) << 23) | (mant << 13);
    }
    float f;
    std::memcpy(&f, &bits, 4);
    return f;
}
#endif

// ---------------------------------------------------------------------------
// dequantization (GGML block formats)
// ---------------------------------------------------------------------------

static void dequant_f16(const uint8_t* raw, float* out, int64_t n) {
    const uint16_t* src = (const uint16_t*)raw;
    for (int64_t i = 0; i < n; ++i) out[i] = fp16_to_fp32(src[i]);
}

static void dequant_bf16(const uint8_t* raw, float* out, int64_t n) {
    const uint16_t* src = (const uint16_t*)raw;
    for (int64_t i = 0; i < n; ++i) {
        uint32_t bits = (uint32_t)src[i] << 16;
        std::memcpy(&out[i], &bits, 4);
    }
}

static void dequant_q8_0(const uint8_t* raw, float* out, int64_t n) {
    const int64_t nb = n / 32;
    for (int64_t b = 0; b < nb; ++b) {
        const uint8_t* blk = raw + b * 34;
        uint16_t dh;
        std::memcpy(&dh, blk, 2);
        const float d = fp16_to_fp32(dh);
        const int8_t* q = (const int8_t*)(blk + 2);
        float* o = out + b * 32;
        for (int i = 0; i < 32; ++i) o[i] = d * (float)q[i];
    }
}

static void dequant_q4_0(const uint8_t* raw, float* out, int64_t n) {
    const int64_t nb = n / 32;
    for (int64_t b = 0; b < nb; ++b) {
        const uint8_t* blk = raw + b * 18;
        uint16_t dh;
        std::memcpy(&dh, blk, 2);
        const float d = fp16_to_fp32(dh);
        const uint8_t* qs = blk + 2;
        float* o = out + b * 32;
        for (int i = 0; i < 16; ++i) {
            o[i] = d * (float)((int)(qs[i] & 0x0F) - 8);
            o[i + 16] = d * (float)((int)(qs[i] >> 4) - 8);
        }
    }
}

static void dequant_q6_k(const uint8_t* raw, float* out, int64_t n) {
    const int64_t nb = n / 256;
    for (int64_t b = 0; b < nb; ++b) {
        const uint8_t* blk = raw + b * 210;
        const uint8_t* ql = blk;
        const uint8_t* qh = blk + 128;
        const int8_t* sc = (const int8_t*)(blk + 192);
        uint16_t dh;
        std::memcpy(&dh, blk + 208, 2);
        const float d = fp16_to_fp32(dh);
        float* y = out + b * 256;
        for (int half = 0; half < 2; ++half) {
            const uint8_t* qlh = ql + half * 64;
            const uint8_t* qhh = qh + half * 32;
            const int8_t* sch = sc + half * 8;
            float* yh = y + half * 128;
            for (int l = 0; l < 32; ++l) {
                const int is = l / 16;
                const int q1 = (int)((qlh[l] & 0xF) | (((qhh[l] >> 0) & 3) << 4)) - 32;
                const int q2 = (int)((qlh[l + 32] & 0xF) | (((qhh[l] >> 2) & 3) << 4)) - 32;
                const int q3 = (int)((qlh[l] >> 4) | (((qhh[l] >> 4) & 3) << 4)) - 32;
                const int q4 = (int)((qlh[l + 32] >> 4) | (((qhh[l] >> 6) & 3) << 4)) - 32;
                yh[l] = d * sch[is] * q1;
                yh[l + 32] = d * sch[is + 2] * q2;
                yh[l + 64] = d * sch[is + 4] * q3;
                yh[l + 96] = d * sch[is + 6] * q4;
            }
        }
    }
}

// type ids match miotts_tpu.gguf.quants.GGMLType
// returns 0 on success, -1 unsupported type, -2 bad size
int mio_dequant(int ggml_type, const uint8_t* raw, float* out, int64_t n,
                int n_threads) {
    int64_t block = 1;
    void (*fn)(const uint8_t*, float*, int64_t) = nullptr;
    int64_t bytes_per_block = 0;
    switch (ggml_type) {
        case 1: fn = dequant_f16; block = 1; bytes_per_block = 2; break;
        case 30: fn = dequant_bf16; block = 1; bytes_per_block = 2; break;
        case 8: fn = dequant_q8_0; block = 32; bytes_per_block = 34; break;
        case 2: fn = dequant_q4_0; block = 32; bytes_per_block = 18; break;
        case 14: fn = dequant_q6_k; block = 256; bytes_per_block = 210; break;
        case 0:  // f32 passthrough
            std::memcpy(out, raw, (size_t)n * 4);
            return 0;
        default: return -1;
    }
    if (n % block != 0) return -2;

    const int64_t n_blocks = n / block;
    n_threads = (int)std::max<int64_t>(1, std::min<int64_t>(n_threads, n_blocks));
    if (n_threads == 1 || n_blocks < 1024) {
        fn(raw, out, n);
        return 0;
    }
    std::vector<std::thread> workers;
    const int64_t per = (n_blocks + n_threads - 1) / n_threads;
    for (int t = 0; t < n_threads; ++t) {
        const int64_t b0 = t * per;
        const int64_t b1 = std::min(n_blocks, b0 + per);
        if (b0 >= b1) break;
        workers.emplace_back([=]() {
            fn(raw + b0 * bytes_per_block, out + b0 * block, (b1 - b0) * block);
        });
    }
    for (auto& w : workers) w.join();
    return 0;
}

// ---------------------------------------------------------------------------
// audio: wav16 encode + linear resample
// ---------------------------------------------------------------------------

// out must have 44 + 2*n bytes; matches mio-tts-lib.cpp:758-791
int mio_encode_wav16(const float* audio, int64_t n, int sample_rate,
                     uint8_t* out) {
    const uint32_t data_size = (uint32_t)(n * 2);
    const uint32_t byte_rate = (uint32_t)sample_rate * 2;
    uint8_t* p = out;
    auto w32 = [&](uint32_t v) { std::memcpy(p, &v, 4); p += 4; };
    auto w16 = [&](uint16_t v) { std::memcpy(p, &v, 2); p += 2; };
    std::memcpy(p, "RIFF", 4); p += 4;
    w32(36 + data_size);
    std::memcpy(p, "WAVE", 4); p += 4;
    std::memcpy(p, "fmt ", 4); p += 4;
    w32(16); w16(1); w16(1); w32((uint32_t)sample_rate); w32(byte_rate);
    w16(2); w16(16);
    std::memcpy(p, "data", 4); p += 4;
    w32(data_size);
    int16_t* pcm = (int16_t*)p;
    for (int64_t i = 0; i < n; ++i) {
        float x = audio[i];
        x = std::max(-1.0f, std::min(1.0f, x));
        pcm[i] = (int16_t)std::lrintf(x * 32767.0f);
    }
    return 0;
}

// linear resampler, same mapping as wavlm-extractor.cpp:218-240
int64_t mio_resample_linear_len(int64_t n_in, int sr_in, int sr_out) {
    if (sr_in == sr_out) return n_in;
    const double ratio = (double)sr_out / (double)sr_in;
    int64_t n = (int64_t)std::llround((double)n_in * ratio);
    return n < 1 ? 1 : n;
}

int mio_resample_linear(const float* in, int64_t n_in, int sr_in, int sr_out,
                        float* out, int64_t n_out) {
    if (n_in <= 0 || n_out <= 0) return -1;
    if (sr_in == sr_out) {
        std::memcpy(out, in, (size_t)std::min(n_in, n_out) * 4);
        return 0;
    }
    const double ratio = (double)sr_out / (double)sr_in;
    for (int64_t i = 0; i < n_out; ++i) {
        const double pos = (double)i / ratio;
        int64_t i0 = (int64_t)std::floor(pos);
        const double t = pos - (double)i0;
        if (i0 < 0) i0 = 0;
        const int64_t i1 = std::min(n_in - 1, i0 + 1);
        i0 = std::min(n_in - 1, i0);
        out[i] = (float)((1.0 - t) * (double)in[i0] + t * (double)in[i1]);
    }
    return 0;
}

// peak normalization used before WavLM (wavlm-extractor.cpp:205-216)
void mio_peak_normalize(float* audio, int64_t n) {
    float max_abs = 0.0f;
    for (int64_t i = 0; i < n; ++i) max_abs = std::max(max_abs, std::fabs(audio[i]));
    max_abs += 1e-8f;
    const float inv = 1.0f / max_abs;
    for (int64_t i = 0; i < n; ++i) audio[i] *= inv;
}

int mio_runtime_abi_version(void) { return 1; }

}  // extern "C"
