#pragma once
#include <tsl/result.h>
#include <tsl/errors.h>
#include <tsl/panic.h>
#define TSL_ASSERT_ARG(x) \
    do { if (!(x)) return A_E_INVAL; } while (0)
#define TSL_ASSERT_ARG_DEBUG(x) TSL_ASSERT_ARG(x)
#define TSL_ASSERT_PTR_BY_REF(x) TSL_ASSERT_ARG(NULL != (x))
#define TSL_BUG_ON(x) \
    do { if (x) PANIC("TSL_BUG_ON(%s) @ %s:%d", #x, __FILE__, __LINE__); } while (0)
#define TSL_BUG_IF_FAILED(x) \
    do { if (FAILED(x)) PANIC("TSL_BUG_IF_FAILED(%s) @ %s:%d", #x, __FILE__, __LINE__); } while (0)
