/* Empty config.h: the reference sources #include "config.h" (autotools-style
 * feature macros); none of its contents are needed for the harness build. */
#ifndef REFSHIM_CONFIG_H
#define REFSHIM_CONFIG_H
#endif
