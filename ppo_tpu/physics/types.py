"""Shared constants for the physics engine (values match mjtJoint/mjtGeom)."""

# joint types
FREE, BALL, SLIDE, HINGE = 0, 1, 2, 3

# geom types (subset we support; values match mjtGeom for easy cross-checks)
PLANE, SPHERE, CAPSULE, BOX = 0, 2, 3, 6

# integrators
EULER, RK4 = 0, 1

# solver
PGS, CG, NEWTON = 0, 1, 2
