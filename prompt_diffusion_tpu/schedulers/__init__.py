from prompt_diffusion_tpu.schedulers.schedules import (
    DiffusionSchedule,
    make_beta_schedule,
    make_ddim_tables,
)
from prompt_diffusion_tpu.schedulers.ddim import DDIMTables, ddim_step
from prompt_diffusion_tpu.schedulers.flow_match import FlowMatchSchedule, flow_match_step
