"""Numerical constants of the likelihood engine.

These mirror the reference engine's tuning constants (reference:
examl/axml.h:88-118,164-179) so that optimization trajectories and final
log-likelihoods are reproducible against the reference binary.
"""

# Branch lengths are stored as z = exp(-t / fracchange) "probabilities of no
# change"; clamped into [ZMIN, ZMAX] (reference: examl/axml.h:110-111).
ZMIN = 1.0e-15
ZMAX = 1.0 - 1.0e-6

DEFAULTZ = 0.9          # starting branch value (axml.h:94)
DELTAZ = 0.00001        # branch-length convergence test in update() (axml.h:93)
SMOOTHINGS = 32         # max smoothing passes through tree (axml.h:89)
ITERATIONS = 10         # max iterations per insert (axml.h:90)
NEWZPERCYCLE = 1        # makenewz iterations per SPR cycle (axml.h:91)

MAX_TIP_EV = 0.999999999  # tip eigenvector-sum clamp (axml.h:88)

# CLV underflow protection: when every entry of a site's CLV drops below
# 2^-256 in magnitude, multiply by 2^256 and remember the (weighted) count
# (axml.h:113-118). Multiplication by a power of two is exact in floating
# point, so this scheme is rounding-free. The f32 path uses 2^30 instead.
TWOTOTHE256 = 2.0 ** 256
MINLIKELIHOOD = 2.0 ** -256

SCALE_EXP_F64 = 256
SCALE_EXP_F32 = 30

LIKELIHOOD_EPSILON = 1e-7  # axml.h:141

ALPHA_MIN = 0.02
ALPHA_MAX = 1000.0
RATE_MIN = 1.0e-7
RATE_MAX = 1.0e6
FREQ_MIN = 0.001
LG4X_RATE_MIN = 1.0e-7
LG4X_RATE_MAX = 1000.0

ITMAX = 100             # Brent max iterations (axml.h:193)
BRENT_ZEPS = 1.0e-5     # Brent epsilon (optimizeModel.c BRENT_VAR)
GOLDEN_RAT = 0.61803399

UNLIKELY = -1.0e300

AA_SCALE = 10.0
AA_SCALE_PLUS_EPSILON = 10.001

NUM_PROT_MODELS = 23    # DAYHOFF..GTR
