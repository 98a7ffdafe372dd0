#pragma once
// Included by the reference's se3_ops.hpp but no Sophus::SE2 symbol is used
// anywhere in the reference sources (verified by grep). Intentionally empty.
