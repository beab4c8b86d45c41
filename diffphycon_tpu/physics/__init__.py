from diffphycon_tpu.physics.burgers import (
    burgers_solve,
    burgers_solve_paired,
    make_burgers_data,
)
