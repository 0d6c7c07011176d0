#pragma once
#include <stdio.h>
enum tsl_shim_severity { SEV_FATAL, SEV_ERROR, SEV_WARNING, SEV_INFO };
/* Log macros swallow their arguments entirely: the reference passes
 * variables that only exist under _TSL_DEBUG into DIAG(...), so the args
 * must not be compiled at all. */
#define MESSAGE(...) do { } while (0)
#define DIAG(...) do { } while (0)
