"""Static configuration constants for the TPU renderers.

These mirror the compile-time constants of the reference CUDA implementation
(reference: cuda_rasterizer/config.h:4-6, cuda_rasterizer/auxiliary.h:8) but are
plain Python constants baked into jit-compiled programs.

Note: unlike CUDA (where the 16x16 tile size is wired into the launch
geometry), the rendered image is tile-size invariant here -- compositing order
is decided purely by the (depth key, emission order) sort and the per-pixel
coverage test -- so TILE_X/TILE_Y are free TPU performance knobs.
"""

# Transmittance early-exit threshold (reference: cuda_rasterizer/auxiliary.h:8).
T_EPS = 1e-4

# Tile size used for binning in the scaled (Pallas) path.
# (reference: cuda_rasterizer/config.h:5-6 uses 16x16.)
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
