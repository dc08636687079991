/* boost::shared_ptr stand-in for the reference-golden harness: alias to
 * std::shared_ptr, which is API-compatible for the reference's usage
 * (typedef boost::shared_ptr<T> sptr; factory returns). */
#ifndef REFSHIM_BOOST_SHARED_PTR_HPP
#define REFSHIM_BOOST_SHARED_PTR_HPP

#include <memory>

namespace boost {
using std::shared_ptr;
}

#endif
