from forwardtacotron_tpu.dsp.audio import DSP

__all__ = ['DSP']
