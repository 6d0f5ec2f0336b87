// evaudio: native host-side audio kernels for the data pipeline.
//
// The reference outsources this work to ffmpeg subprocesses and
// numpy-with-stride-tricks (reference: src/utils/audio/__init__.py:13-32,
// src/audiokit/slicer/slicer.py:150-180). Preprocessing thousands of clips
// per fine-tune run is host-bound on TPU machines, so the hot pieces live
// here as a small C++ library bound over ctypes:
//
//   evaudio_resample_poly   windowed-sinc polyphase resampler
//   evaudio_frame_rms       frame RMS for the silence slicer
//   evaudio_float_to_int16  clipped int16 conversion (round-half-away)
//   evaudio_peak            max |x|
//   evaudio_mix_normalize   GPT-SoVITS amplitude-mix normalization
//
// Build: tools/build_native.sh  (g++ -O3 -march=native -shared -fPIC)
#include <cmath>
#include <cstdint>
#include <cstring>
#include <algorithm>
#include <vector>

extern "C" {

// max |x| over n samples
float evaudio_peak(const float* x, int64_t n) {
    float peak = 0.0f;
    for (int64_t i = 0; i < n; ++i) {
        float a = std::fabs(x[i]);
        if (a > peak) peak = a;
    }
    return peak;
}

// float [-1,1] -> int16 with round-half-to-even (numpy semantics) + clipping
void evaudio_float_to_int16(const float* x, int16_t* out, int64_t n,
                            float scale) {
    for (int64_t i = 0; i < n; ++i) {
        float v = x[i] * scale;
        v = std::max(-32768.0f, std::min(32767.0f, std::nearbyintf(v)));
        out[i] = static_cast<int16_t>(v);
    }
}

// frame RMS: centered frames with constant (zero) padding, matching
// librosa.feature.rms / the reference slicer's stride-trick implementation.
//   y: n samples; out: 1 + n/hop frames
void evaudio_frame_rms(const float* y, int64_t n, int64_t frame_length,
                       int64_t hop_length, double* out, int64_t n_frames) {
    const int64_t pad = frame_length / 2;
    for (int64_t f = 0; f < n_frames; ++f) {
        const int64_t start = f * hop_length - pad;
        double acc = 0.0;
        const int64_t lo = std::max<int64_t>(start, 0);
        const int64_t hi = std::min<int64_t>(start + frame_length, n);
        for (int64_t i = lo; i < hi; ++i) acc += (double)y[i] * (double)y[i];
        out[f] = std::sqrt(acc / (double)frame_length);
    }
}

// GPT-SoVITS amplitude-mix normalization (normalize.py:155-163):
//   out = x / peak * (maxx * alpha * scale) + (1 - alpha) * scale * x
void evaudio_mix_normalize(const float* x, float* out, int64_t n, float peak,
                           float maxx, float alpha, float scale) {
    const float a = (peak > 0.0f) ? (maxx * alpha * scale) / peak : 0.0f;
    const float b = (1.0f - alpha) * scale;
    for (int64_t i = 0; i < n; ++i) out[i] = x[i] * a + x[i] * b;
}

// Polyphase windowed-sinc resampler (Kaiser-windowed lowpass), zero-phase.
// Matches scipy.signal.resample_poly semantics closely enough for feature
// extraction (cutoff at min(up,down) Nyquist, 10-tap-per-phase kernel).
static double bessel_i0(double x) {
    double sum = 1.0, term = 1.0;
    for (int k = 1; k < 32; ++k) {
        term *= (x / (2.0 * k)) * (x / (2.0 * k));
        sum += term;
        if (term < 1e-16 * sum) break;
    }
    return sum;
}

int64_t evaudio_resample_len(int64_t n, int64_t up, int64_t down) {
    return (n * up + down - 1) / down;
}

void evaudio_resample_poly(const float* x, int64_t n, int64_t up,
                           int64_t down, float* out) {
    const int kTapsPerPhase = 20;
    const int64_t half = (int64_t)kTapsPerPhase * std::max(up, down) / 2;
    const double cutoff = 0.5 / (double)std::max(up, down);
    const double beta = 8.6;  // Kaiser beta ~ 90 dB stopband
    const int64_t klen = 2 * half + 1;

    std::vector<double> kernel(klen);
    const double i0b = bessel_i0(beta);
    for (int64_t i = 0; i < klen; ++i) {
        const double t = (double)(i - half);
        const double sinc = (t == 0.0)
            ? 2.0 * cutoff
            : std::sin(2.0 * M_PI * cutoff * t) / (M_PI * t);
        const double w = bessel_i0(
            beta * std::sqrt(std::max(0.0, 1.0 - (t / half) * (t / half))))
            / i0b;
        kernel[i] = sinc * w * (double)up;
    }

    const int64_t out_n = evaudio_resample_len(n, up, down);
    for (int64_t j = 0; j < out_n; ++j) {
        // output sample j corresponds to input position j*down/up
        const int64_t num = j * down;           // position * up
        double acc = 0.0;
        // kernel index k matches input sample i where i*up = num + (k-half)
        // iterate over input samples within the kernel span
        const int64_t i_lo = std::max<int64_t>(0, (num - half + up - 1) / up);
        const int64_t i_hi = std::min<int64_t>(n - 1, (num + half) / up);
        for (int64_t i = i_lo; i <= i_hi; ++i) {
            const int64_t k = i * up - num + half;
            if (k >= 0 && k < klen) acc += (double)x[i] * kernel[k];
        }
        out[j] = (float)acc;
    }
}

}  // extern "C"
