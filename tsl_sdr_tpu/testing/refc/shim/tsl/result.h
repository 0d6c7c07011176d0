/* Minimal TSL shim: just enough of the external TSL base library's surface
 * (github.com/pvachon/tsl, not vendored in the reference tree) to compile
 * the reference's pager/ais/filter sources unmodified as a test oracle.
 * Written from the call sites enumerated in SURVEY.md §2.3 — no TSL code
 * was consulted or copied. */
#pragma once
#include <stdint.h>
#include <stddef.h>

typedef int aresult_t;
#define A_OK 0
#define FAILED(x) ((x) != A_OK)
#define FAILED_UNLIKELY(x) FAILED(x)

/* TSL basic-lib helpers used by filter inner loops */
#ifndef BL_MIN2
#define BL_MIN2(a, b) ((a) < (b) ? (a) : (b))
#endif
#ifndef BL_MAX2
#define BL_MAX2(a, b) ((a) > (b) ? (a) : (b))
#endif
#ifndef BL_CONTAINER_OF
#define BL_CONTAINER_OF(ptr, type, member) \
    ((type *)((char *)(ptr) - offsetof(type, member)))
#endif
