"""Model layer: synthesizer modules, control networks, encoders, CREPE."""

from ddsp_tpu.models.autoencoder import (
    autoencoder_apply,
    autoencoder_init,
    encode,
    feature_pad,
)
from ddsp_tpu.models.controller import (
    controller_apply,
    controller_init,
    decoder_apply,
    decoder_init,
    decoder_synth_only,
    modified_sigmoid,
)
from ddsp_tpu.models.crepe import (
    crepe_forward,
    crepe_init,
    load_torch_checkpoint,
    pitch_argmax,
    pitch_weighted,
)
from ddsp_tpu.models.encoder import (
    encoder_apply,
    f0_encoder_apply,
    loudness_encoder_apply,
)
from ddsp_tpu.models.synths import (
    noise_apply,
    oscillator_apply,
    oscillator_live,
    reverb_apply,
    reverb_impulse,
    reverb_init,
    reverb_live,
)
