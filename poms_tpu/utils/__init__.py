from poms_tpu.utils.logging import ConvergenceLogger
from poms_tpu.utils.checkpoint import save_solver_state, load_solver_state
