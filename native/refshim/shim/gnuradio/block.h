/* Minimal gr::block stand-in for the reference-golden harness.
 *
 * Provides exactly the runtime surface the four dvbt2ll blocks use
 * (SURVEY.md section 1: gr::block ctor, forecast/general_work virtuals,
 * set_output_multiple, consume_each, d_logger + GR_LOG macros, the
 * gr_vector_* typedefs and gr_complex).  No scheduler: the harness driver
 * calls general_work() directly with externally allocated buffers.
 */
#ifndef REFSHIM_GR_BLOCK_H
#define REFSHIM_GR_BLOCK_H

#include <bitset>
#include <cmath>
#include <complex>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <memory>
#include <new>
#include <string>
#include <vector>

#include <boost/shared_ptr.hpp>
#include <gnuradio/io_signature.h>

typedef std::complex<float> gr_complex;
typedef std::complex<double> gr_complexd;
typedef std::vector<int> gr_vector_int;
typedef std::vector<const void*> gr_vector_const_void_star;
typedef std::vector<void*> gr_vector_void_star;

namespace gr {

struct logger_stub {
    const char* name = "refshim";
};
typedef logger_stub* logger_ptr;

#define GR_LOG_WARN(logger, msg) \
    do { std::fprintf(stderr, "refshim WARN: %s\n", std::string(msg).c_str()); } while (0)
#define GR_LOG_FATAL(logger, msg) \
    do { std::fprintf(stderr, "refshim FATAL: %s\n", std::string(msg).c_str()); } while (0)
#define GR_LOG_INFO(logger, msg) \
    do { std::fprintf(stderr, "refshim INFO: %s\n", std::string(msg).c_str()); } while (0)

class block {
public:
    virtual ~block() {}

    virtual void forecast(int noutput_items, gr_vector_int& ninput_items_required) {
        (void)noutput_items;
        (void)ninput_items_required;
    }
    virtual int general_work(int noutput_items,
                             gr_vector_int& ninput_items,
                             gr_vector_const_void_star& input_items,
                             gr_vector_void_star& output_items) = 0;

    void set_output_multiple(int multiple) { d_output_multiple = multiple; }
    int output_multiple() const { return d_output_multiple; }
    void set_relative_rate(double rate) { d_relative_rate = rate; }
    void consume_each(int how_many) { d_consumed += how_many; }

    /* harness accessors (not part of the GR API) */
    long long refshim_consumed() const { return d_consumed; }
    void refshim_reset_consumed() { d_consumed = 0; }

    logger_ptr d_logger = &d_logger_storage;

protected:
    block() {}
    block(const std::string& name, io_signature::sptr, io_signature::sptr)
        : d_name(name) {}

private:
    std::string d_name;
    int d_output_multiple = 1;
    double d_relative_rate = 1.0;
    long long d_consumed = 0;
    logger_stub d_logger_storage;
};

}  // namespace gr

namespace gnuradio {
template <class T>
std::shared_ptr<T> get_initial_sptr(T* p) {
    return std::shared_ptr<T>(p);
}
}  // namespace gnuradio

#endif
