"""Shared constants for the physics engine (values match mjtJoint/mjtGeom)."""

# joint types
FREE, BALL, SLIDE, HINGE = 0, 1, 2, 3

# geom types (subset we support; values match mjtGeom for easy cross-checks)
PLANE, SPHERE, CAPSULE, BOX = 0, 2, 3, 6

# integrators
EULER, RK4 = 0, 1

# solver
PGS, CG, NEWTON = 0, 1, 2

# Trace-time flag: true while tracing inside a Pallas kernel body (see
# physics/mega.py). Lane-major code consults it to emit Mosaic-friendly
# forms (unrolled static gathers / list-built scatters instead of
# gather/scatter HLOs) and to keep nested pallas_calls out of the kernel.
# A plain mutable cell (not a contextvar): kernel tracing is synchronous —
# an assumption physics/mega.py now ENFORCES (asserts the flag is clear
# before setting it and records the owning thread id as KERNEL_MODE[1]).
KERNEL_MODE = [False]
