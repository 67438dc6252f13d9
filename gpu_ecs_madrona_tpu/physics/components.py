"""Physics component set — mirrors reference include/madrona/physics.hpp.

Each reference component (physics.hpp:150-258) maps to a batched SoA
component; quaternions (w,x,y,z), vectors xyz.  The solver's per-body
stashes (SubstepPrevState / PreSolvePositional / PreSolveVelocity,
physics.hpp:396-413) are ordinary components here exactly as in the
reference's solver archetype columns (physics.cpp Cols table).
"""

import jax.numpy as jnp

from gpu_ecs_madrona_tpu.core.component import component, singleton_component

# Dynamics state (physics.hpp:168-173 Velocity)
Velocity = component("Velocity", linear=((3,), jnp.float32), angular=((3,), jnp.float32))

# Response type enum (physics.hpp:161-166): 0=Dynamic, 1=Kinematic, 2=Static
ResponseType = component("ResponseType", ((), jnp.int32))
RESPONSE_DYNAMIC = 0
RESPONSE_KINEMATIC = 1
RESPONSE_STATIC = 2

# External force/torque accumulators (physics.hpp:150-159)
ExternalForce = component("ExternalForce", ((3,), jnp.float32))
ExternalTorque = component("ExternalTorque", ((3,), jnp.float32))

# Broadphase leaf bookkeeping (physics.hpp:297-299 LeafID).  On TPU the
# "leaf" is simply the body's row; the component exists for API parity and
# for velocity-expanded AABB storage.
CollisionAABB = component("CollisionAABB", lo=((3,), jnp.float32), hi=((3,), jnp.float32))
LeafID = component("LeafID", ((), jnp.int32))

# Solver stashes (physics.hpp:396-413)
SubstepPrevState = component(
    "SubstepPrevState", prev_pos=((3,), jnp.float32), prev_rot=((4,), jnp.float32)
)
PreSolvePositional = component(
    "PreSolvePositional", x=((3,), jnp.float32), q=((4,), jnp.float32)
)
PreSolveVelocity = component(
    "PreSolveVelocity", v=((3,), jnp.float32), omega=((3,), jnp.float32)
)

# Collision events (physics.hpp:175-183): per-step (a, b) pairs reported to
# game logic when bodies touch.
CollisionEvent = component("CollisionEvent", a=((), jnp.int32), b=((), jnp.int32))

# Candidate/contact temporaries (physics.hpp:184-198).  CandidateCollision
# stores entity handles (the reference stores Locs; handles are the stable
# TPU equivalent since rows never move under masked allocation).
CandidateCollision = component(
    "CandidateCollision", a=((), jnp.int32), b=((), jnp.int32)
)
# Internal compacted-candidate rows (body ROW indices, not entity handles):
# the pairs-mode substep gathers body data through these (the TPU analog of
# the reference narrowphase reading candidate entity refs directly).
CandidatePairRows = component(
    "CandidatePairRows", i=((), jnp.int32), j=((), jnp.int32)
)
ContactConstraint = component(
    "ContactConstraint",
    ref=((), jnp.int32),        # entity handle of reference body
    alt=((), jnp.int32),        # entity handle of other body
    points=((4, 4), jnp.float32),   # xyz + penetration depth per point
    num_points=((), jnp.int32),
    normal=((3,), jnp.float32),
    lambda_n=((4,), jnp.float32),
)

# Joints (physics.hpp:200-243).  Union payload flattened into one struct;
# joint_type selects interpretation (0=Fixed, 1=Hinge).
JointConstraint = component(
    "JointConstraint",
    e1=((), jnp.int32),
    e2=((), jnp.int32),
    joint_type=((), jnp.int32),
    # Fixed: attach_rot1/2 (quat), separation
    attach_rot1=((4,), jnp.float32),
    attach_rot2=((4,), jnp.float32),
    separation=((), jnp.float32),
    # Hinge: axes in each body's local frame
    a1_local=((3,), jnp.float32),
    a2_local=((3,), jnp.float32),
    b1_local=((3,), jnp.float32),
    b2_local=((3,), jnp.float32),
    # Common attachment points
    r1=((3,), jnp.float32),
    r2=((3,), jnp.float32),
)
JOINT_FIXED = 0
JOINT_HINGE = 1

# Per-world solver/config singleton (reference stores these in the solver
# singleton + PhysicsSystemState; physics.cpp:1012-1036 init).
PhysicsState = singleton_component(
    "PhysicsState",
    delta_t=((), jnp.float32),
    h=((), jnp.float32),              # substep dt = delta_t / num_substeps
    gravity=((3,), jnp.float32),
    restitution_threshold=((), jnp.float32),  # 2*|g|*h (physics.cpp:31)
)

# World-level sleeping (beyond the reference, which has no sleeping): a
# world whose every dynamic body has been below the sleep velocity
# threshold for sleep_frames consecutive steps — with no external
# force/torque applied — is put to sleep: its state is frozen bit-exactly
# and the fused substep kernel skips the whole pipeline for world blocks
# where every world is asleep (pl.when early-exit).  Waking is by
# observation: any externally-set velocity above threshold or nonzero
# ExternalForce/Torque resets the counter.  Registered unconditionally
# (two [W] ints) so the state schema does not depend on the opt-in flag.
SleepState = singleton_component(
    "SleepState",
    quiet_steps=((), jnp.int32),      # consecutive below-threshold steps
    asleep=((), jnp.int32),           # 1 = frozen last step (observable)
)
