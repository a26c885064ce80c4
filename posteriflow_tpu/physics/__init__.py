"""Pure-JAX gravitational-wave physics engine.

The TPU-native replacement for the reference's bilby/LALSuite stack — the
only native code in the reference system (SURVEY.md: "Implementation
language" note; src/ahsd/data/bilby_pipeline.py). Everything here is
jittable, differentiable, and vmappable, which is what makes on-device
training-data synthesis (simulator.py) and vmapped importance-sampling
likelihoods possible.
"""

from posteriflow_tpu.physics import constants
from posteriflow_tpu.physics.detectors import (antenna_pattern, gmst_from_gps,
                                               network_response,
                                               time_delay_from_geocenter)
from posteriflow_tpu.physics.projection import project_to_network
from posteriflow_tpu.physics.psd import (advirgo_psd, aligo_psd, asd_from_psd,
                                         default_network_asd,
                                         default_network_psd, psd_for)
from posteriflow_tpu.physics.simulator import (EventBatch, SimConfig,
                                               signal_white_fd,
                                               simulate_batch, simulate_event)
from posteriflow_tpu.physics.whiten import (colored_noise_td, fd_white_to_td,
                                            matched_filter_snr_fd,
                                            matched_filter_snr_td,
                                            network_snr_whitened, whiten_fd,
                                            whiten_td)

__all__ = [
    "constants", "antenna_pattern", "gmst_from_gps", "network_response",
    "time_delay_from_geocenter", "project_to_network", "aligo_psd",
    "advirgo_psd", "asd_from_psd", "default_network_psd",
    "default_network_asd", "psd_for",
    "EventBatch", "SimConfig", "signal_white_fd", "simulate_batch",
    "simulate_event", "colored_noise_td", "fd_white_to_td",
    "matched_filter_snr_fd", "matched_filter_snr_td",
    "network_snr_whitened", "whiten_fd", "whiten_td",
]
