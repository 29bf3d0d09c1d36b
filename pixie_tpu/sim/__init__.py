from pixie_tpu.sim.types import MPMConfig, MPMState, MATERIAL_ID_TO_NAME, NAME_TO_MATERIAL_ID
from pixie_tpu.sim.solver import MPMSolver
