"""Static configuration constants for the TPU renderers.

These mirror the compile-time constants of the reference CUDA implementation
(reference: cuda_rasterizer/config.h:4-6, cuda_rasterizer/auxiliary.h:8) but are
plain Python constants baked into jit-compiled programs.

Note: unlike CUDA (where the 16x16 tile size is wired into the launch
geometry), the rendered image is ALMOST tile-size invariant here --
compositing order is decided purely by the (depth key, emission order) sort
and the per-pixel coverage test. The one tile-size-dependent semantic: a
face is only tested against pixels of tiles in its bbox rect, and for
near-plane faces whose int32 edge functions WRAP, coverage can pass outside
the rect -- there the rect granularity decides (see
ops/tri_oracle.py module docstring). All tri paths therefore share one
rect granularity, BIN_TILE.
"""

# Transmittance early-exit threshold (reference: cuda_rasterizer/auxiliary.h:8).
T_EPS = 1e-4

# Tile side of the scaled (Pallas) binned path AND the coverage rect
# granularity of every tri path: 32*32 px = 1024 = 8*128 lanes, exactly one
# f32 VPU register block per pixel quantity. (The reference uses 16x16,
# cuda_rasterizer/config.h:5-6 -- wrapped near-plane coverage at the rect
# edge is the only place the difference can show; see module docstring.)
BIN_TILE = 32

# Tile size used by the DENSE tet path's preprocess (depth keys / culling
# only -- both granularity-independent; the binned paths use BIN_TILE).
TILE_X = 16
TILE_Y = 16

# Fixed-point subpixel resolution of the coverage test
# (reference: cuda_rasterizer/auxiliary.h:190). NOT a free knob: 16 is
# the reference's coverage-parity contract, and the Pallas kernels'
# pixel-coordinate tables and the exact-emission interval margins bake
# the same 16x (+8 half-pixel) fixed-point scale as literals
# (tri_binned._pixel_coords, binning._row_tile_interval).
SUBPIXEL = 16.0

# Number of color channels (reference: cuda_rasterizer/config.h:4).
NUM_CHANNELS = 3

# clamp_w epsilon guarding the perspective divide
# (reference: cuda_rasterizer/auxiliary.h:245-253).
W_EPS = 1e-4

# Hard cap on tet ray-march steps (the reference while-loop is implicitly
# bounded by tessellation size; under jit we need an explicit bound).
DEFAULT_MAX_MARCH_STEPS = 512
