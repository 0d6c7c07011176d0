#pragma once
#include <stdio.h>
#include <stdlib.h>
#define PANIC(fmt, ...) \
    do { fprintf(stderr, "PANIC: " fmt "\n", ##__VA_ARGS__); abort(); } while (0)
