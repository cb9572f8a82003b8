"""dgpmp2_tpu — TPU-native differentiable Gaussian Process Motion Planning.

A from-scratch JAX/XLA/Pallas rebuild of the dGPMP2 framework (Bhardwaj,
Boots, Mukadam, ICRA 2020): batched Gauss-Newton trajectory optimization on
a GP-prior factor graph, differentiable end-to-end through the unrolled
optimizer, with learnable factor covariances.  Reference implementation:
mhmukadam/dgpmp2 (PyTorch); design blueprint: SURVEY.md.
"""
from dgpmp2_tpu.core.graph import GraphSpec, GraphParams
from dgpmp2_tpu.core.gn import OptimConfig, gn_step, plan
from dgpmp2_tpu.core.multistart import (
    MultistartResult, perturbed_inits, plan_multistart, score_candidates,
    select_best,
)
from dgpmp2_tpu.envs import Env2D, Env3D
from dgpmp2_tpu.planner import DiffGPMP2Planner, GPMP2Planner
from dgpmp2_tpu.robots import (
    PlanarArm2Link, PlanarArmNLink, PointRobot2D, PointRobot3D,
    PointRobotXYH, RobotModel,
    make_robot, self_collision_pairs,
)
from dgpmp2_tpu.serve import (
    LearnedPlanningAdapter, MultistartPlanningAdapter, PlanningService,
    PlanRequest, PlanResponse, TaskSpacePlanningAdapter,
)

__version__ = "0.2.0"
