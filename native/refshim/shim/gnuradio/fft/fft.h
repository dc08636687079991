/* gr::fft::fft_complex stand-in for the reference-golden harness.
 *
 * GNU Radio's fft_complex wraps single-precision FFTW; the reference
 * constructs it with forward=false (pilotgenp1insert_cc_impl.cc:1156,1222),
 * i.e. an UNNORMALIZED inverse DFT: X[n] = sum_k x[k]·exp(+2πi·k·n/N).
 * Here: iterative radix-2 Cooley-Tukey computed in double precision
 * (all DVB-T2 sizes are powers of two, 1024..32768), results cast to
 * float — more accurate than FFTW single precision, which is what we
 * want from a golden-vector generator.
 */
#ifndef REFSHIM_GR_FFT_H
#define REFSHIM_GR_FFT_H

#include <cmath>
#include <complex>
#include <vector>

namespace gr {
namespace fft {

class fft_complex {
public:
    fft_complex(int fft_size, bool forward = true, int nthreads = 1)
        : d_size(fft_size), d_forward(forward),
          d_in(fft_size), d_out(fft_size), d_work(fft_size) {
        (void)nthreads;
        /* precompute twiddles for the largest stage */
        d_tw.resize(d_size / 2);
        const double sign = d_forward ? -1.0 : 1.0;
        for (int i = 0; i < d_size / 2; i++) {
            double ang = sign * 2.0 * M_PI * i / d_size;
            d_tw[i] = std::complex<double>(std::cos(ang), std::sin(ang));
        }
        d_rev.resize(d_size);
        int bits = 0;
        while ((1 << bits) < d_size) bits++;
        for (int i = 0; i < d_size; i++) {
            int r = 0;
            for (int b = 0; b < bits; b++) r |= ((i >> b) & 1) << (bits - 1 - b);
            d_rev[i] = r;
        }
    }

    std::complex<float>* get_inbuf() { return d_in.data(); }
    std::complex<float>* get_outbuf() { return d_out.data(); }
    int inbuf_length() const { return d_size; }
    int outbuf_length() const { return d_size; }

    void execute() {
        for (int i = 0; i < d_size; i++) {
            d_work[d_rev[i]] = std::complex<double>(d_in[i].real(), d_in[i].imag());
        }
        for (int len = 2; len <= d_size; len <<= 1) {
            const int half = len >> 1;
            const int step = d_size / len;
            for (int base = 0; base < d_size; base += len) {
                for (int k = 0; k < half; k++) {
                    const std::complex<double> w = d_tw[k * step];
                    const std::complex<double> u = d_work[base + k];
                    const std::complex<double> v = d_work[base + k + half] * w;
                    d_work[base + k] = u + v;
                    d_work[base + k + half] = u - v;
                }
            }
        }
        for (int i = 0; i < d_size; i++) {
            d_out[i] = std::complex<float>((float)d_work[i].real(),
                                           (float)d_work[i].imag());
        }
    }

private:
    int d_size;
    bool d_forward;
    std::vector<std::complex<float>> d_in, d_out;
    std::vector<std::complex<double>> d_work;
    std::vector<std::complex<double>> d_tw;
    std::vector<int> d_rev;
};

}  // namespace fft
}  // namespace gr

#endif
