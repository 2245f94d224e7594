"""pix2pixhdaudiosr_tpu — a TPU-native (JAX/XLA/Pallas/pjit) speech super-resolution
framework with the capabilities of the reference `ishine/pix2pixHDAudioSR`.

Bandwidth extension is treated as image-to-image translation on MDCT
spectrograms: a low-rate waveform is transformed to a real, phase-aware MDCT
spectrogram on-device, the missing high band is noise-masked, a pix2pixHD
generator fills it in under multiscale PatchGAN + LSGAN + feature-matching
losses, and the output is inverted straight back to a waveform by IMDCT
overlap-add (no vocoder).

Design notes (TPU-first, not a port):
  * All DCT/MDCT transforms are precomputed-basis matmuls on the MXU (the
    reference uses a DREAMPlace-derived C++/CUDA FFT+twiddle library,
    reference dct/src/). Framing and overlap-add are pure reshapes when
    win_length is a multiple of hop_length, so the whole signal path fuses
    into a handful of XLA HLOs.
  * Training is a single jitted two-optimizer GAN step under `jax.sharding`
    over a device mesh (the reference uses torch.nn.DataParallel + NCCL).
  * bf16 compute with f32 params/optimizer state replaces torch.cuda.amp.
"""

__version__ = "0.1.0"
