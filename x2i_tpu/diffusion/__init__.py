from x2i_tpu.diffusion.scheduler import (
    FlowMatchEulerScheduler,
    calculate_shift,
    compute_density_for_timestep_sampling,
    loss_weighting,
)
from x2i_tpu.diffusion.sampling import (
    prepare_latent_image_ids,
    pack_latents,
    unpack_latents,
    denoise,
    denoise_flux,
)
