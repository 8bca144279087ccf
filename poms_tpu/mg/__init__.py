from poms_tpu.mg.smoother import SmootherConfig, smooth_step
from poms_tpu.mg.hierarchy import build_hierarchy, Level
from poms_tpu.mg.cycles import CycleConfig, cycle
from poms_tpu.mg.solver import MultigridSolver, SolveResult
