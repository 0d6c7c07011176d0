#pragma once
#define CAL_ALIGN(x) __attribute__((aligned(x)))
#define CAL_CACHE_ALIGNED __attribute__((aligned(SYS_CACHE_LINE_LENGTH)))
#define CAL_PACKED __attribute__((packed))
#define CAL_UNUSED __attribute__((unused))
#define CAL_CLEANUP(fn) __attribute__((cleanup(fn)))
