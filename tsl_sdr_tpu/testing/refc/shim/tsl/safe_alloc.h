#pragma once
#include <stdlib.h>
#include <string.h>
#include <tsl/result.h>
#include <tsl/errors.h>

#ifndef SYS_CACHE_LINE_LENGTH
#define SYS_CACHE_LINE_LENGTH 64
#endif

static inline aresult_t __tsl_shim_zalloc(void **p, size_t bytes, size_t align)
{
    void *mem = NULL;
    if (align < sizeof(void *)) align = sizeof(void *);
    if (posix_memalign(&mem, align, bytes ? bytes : 1)) return A_E_NOMEM;
    memset(mem, 0, bytes);
    *p = mem;
    return A_OK;
}

/* TZAALLOC(ptr, align): zeroed alloc of sizeof(*ptr), assigned to ptr */
#define TZAALLOC(ptr, align) \
    __tsl_shim_zalloc((void **)&(ptr), sizeof(*(ptr)), (align))
/* TACALLOC(pptr, nmemb, size, align): zeroed array alloc, by reference */
#define TACALLOC(pptr, nmemb, size, align) \
    __tsl_shim_zalloc((void **)(pptr), (size_t)(nmemb) * (size_t)(size), (align))
/* TCALLOC(pptr, nmemb, size): zeroed array alloc, default alignment */
#define TCALLOC(pptr, nmemb, size) \
    __tsl_shim_zalloc((void **)(pptr), (size_t)(nmemb) * (size_t)(size), sizeof(void *))
#define TFREE(ptr) do { free((void *)(ptr)); (ptr) = NULL; } while (0)
