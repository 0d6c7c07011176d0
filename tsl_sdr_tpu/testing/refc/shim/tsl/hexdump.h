#pragma once
#include <stddef.h>
static inline void hexdump_dump_hex(const void *buf, size_t len)
{
    (void)buf; (void)len; /* diagnostics only; silent in the test oracle */
}
