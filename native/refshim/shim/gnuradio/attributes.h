/* Minimal stand-in for gnuradio/attributes.h — just the export macros the
 * reference's api.h expects.  Part of the reference-golden harness: we
 * compile the UNMODIFIED reference sources (/root/reference/lib) against
 * these stub headers to produce ground-truth vectors. */
#ifndef REFSHIM_GR_ATTRIBUTES_H
#define REFSHIM_GR_ATTRIBUTES_H

#define __GR_ATTR_EXPORT
#define __GR_ATTR_IMPORT

#endif
