from diffphycon_tpu.baselines.sl_burgers import sl_optimize_control
from diffphycon_tpu.baselines.pid_burgers import PIDController, pid_control
from diffphycon_tpu.baselines.mpc_jellyfish import mpc_plan, mpc_receding_horizon
from diffphycon_tpu.baselines.envs import JellyfishRLEnv, SmokeRLEnv
