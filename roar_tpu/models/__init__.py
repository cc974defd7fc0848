"""Model zoo (flax.linen)."""

from roar_tpu.models.aligner import AlignmentEncoder  # noqa: F401
from roar_tpu.models.fastpitch import (  # noqa: F401
    AlignerConfig,
    FastPitchModule,
    FFTConfig,
    PredictorConfig,
    TemporalPredictor,
)
from roar_tpu.models.dac import DAC, DACModel, ResidualVectorQuantize  # noqa: F401
from roar_tpu.models.waveglow import WaveGlowModel, WaveGlowModule  # noqa: F401
from roar_tpu.models.transformer import (  # noqa: F401
    FFTransformerDecoder,
    FFTransformerEncoder,
    MultiHeadAttn,
    TransformerLayer,
)
from roar_tpu.models.bert import (  # noqa: F401
    BertConfig,
    BertEncoder,
    BertForMaskedLM,
    masked_mlm_loss,
)
