/* Minimal VOLK stand-in for the reference-golden harness: plain-loop
 * implementations of the two kernels the reference uses
 * (pilotgenp1insert_cc_impl.cc:2888 and :2894). */
#ifndef REFSHIM_VOLK_H
#define REFSHIM_VOLK_H

#include <complex>

typedef std::complex<float> lv_32fc_t;

static inline void volk_32fc_x2_multiply_32fc(lv_32fc_t* out,
                                              const lv_32fc_t* a,
                                              const lv_32fc_t* b,
                                              unsigned int num_points) {
    for (unsigned int i = 0; i < num_points; i++) out[i] = a[i] * b[i];
}

static inline void volk_32fc_s32fc_multiply_32fc(lv_32fc_t* out,
                                                 const lv_32fc_t* in,
                                                 const lv_32fc_t scalar,
                                                 unsigned int num_points) {
    for (unsigned int i = 0; i < num_points; i++) out[i] = in[i] * scalar;
}

#endif
