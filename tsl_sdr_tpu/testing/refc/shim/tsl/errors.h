#pragma once
#include <tsl/result.h>
#define A_E_INVAL (-22)
#define A_E_NOMEM (-12)
#define A_E_BUSY  (-16)
#define A_E_DONE  (-99)
