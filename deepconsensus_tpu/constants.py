"""Shared constants for the TPU-native DeepConsensus rebuild.

Behavioral contract mirrors reference `deepconsensus/utils/dc_constants.py`
(vocab, strand encoding, cigar op codes, split regions) without depending on
pysam or TensorFlow.
"""

import enum

import numpy as np

# Framework version (reference: dc_constants.py:36).
__version__ = '1.2.0'

# Sequence vocabulary. GAP deliberately sorts first so that integer id 0 is
# the gap/pad token (reference: dc_constants.py:39-45). Note the unusual
# base order (A,T,C,G) — it is part of the on-disk example contract.
GAP = ' '
ALLOWED_BASES = 'ATCG'
SEQ_VOCAB = GAP + ALLOWED_BASES
SEQ_VOCAB_SIZE = len(SEQ_VOCAB)
GAP_INT = 0

# Byte-valued vocab lookup tables for vectorized encode/decode.
# SEQ_VOCAB_BYTES[k] is the ASCII code of vocab entry k.
SEQ_VOCAB_BYTES = np.frombuffer(SEQ_VOCAB.encode(), dtype=np.uint8)
# BASE_TO_ID[ascii] -> vocab id (gap for unknown chars, matching the
# reference's `bases_encoded` which leaves unknown chars at arbitrary fill;
# in practice inputs only contain ' ACGT').
BASE_TO_ID = np.zeros(256, dtype=np.uint8)
for _k, _c in enumerate(SEQ_VOCAB):
  BASE_TO_ID[ord(_c)] = _k


class Issue(int, enum.Enum):
  """Reasons a ZMW can be dropped during training preprocess."""

  TRUTH_ALIGNMENT_NOT_FOUND = 1
  SUPP_TRUTH_ALIGNMENT = 2


class Strand(int, enum.Enum):
  """Alignment strand encoding (reference: dc_constants.py:57-60)."""

  UNKNOWN = 0
  FORWARD = 1
  REVERSE = 2


# BAM cigar op codes (SAM spec v1.6 order; same ints as pysam constants).
CMATCH = 0  # M
CINS = 1  # I
CDEL = 2  # D
CREF_SKIP = 3  # N
CSOFT_CLIP = 4  # S
CHARD_CLIP = 5  # H
CPAD = 6  # P
CEQUAL = 7  # =
CDIFF = 8  # X
CBACK = 9  # B

CIGAR_CHARS = 'MIDNSHP=XB'
CIGAR_OPS = {c: i for i, c in enumerate(CIGAR_CHARS)}

# Ops that consume the query sequence.
QUERY_ADVANCING_OPS = (CMATCH, CINS, CSOFT_CLIP, CEQUAL, CDIFF)
# Ops that consume the reference.
REF_ADVANCING_OPS = (CMATCH, CDEL, CREF_SKIP, CEQUAL, CDIFF)
# Ops that advance through the read during truth-label bookkeeping
# (reference: dc_constants.py:47-49 -> M, I, =, X).
READ_ADVANCING_OPS = (CMATCH, CINS, CEQUAL, CDIFF)

NP_DATA_TYPE = np.float32

# Train/eval/test region assignment for known genomes
# (reference: dc_constants.py:90-111).
ECOLI_REGIONS = {
    'TRAIN': (464253, 4178270),
    'EVAL': (0, 464252),
    'TEST': (4178271, 4642522),
}
TRAIN_REGIONS = {
    'HUMAN': (
        [str(i) for i in range(1, 19)]
        + ['chr%d' % i for i in range(1, 19)]
        + ['X', 'Y', 'chrX', 'chrY']
    ),
    'MAIZE': [str(i) for i in range(1, 9)] + ['chr%d' % i for i in range(1, 9)],
}
EVAL_REGIONS = {
    'HUMAN': ['21', '22', 'chr21', 'chr22'],
    'MAIZE': ['9', 'chr9'],
}
TEST_REGIONS = {
    'HUMAN': ['19', '20', 'chr19', 'chr20'],
    'MAIZE': ['10', 'chr10'],
}

# Feature keys carried through batching (reference: dc_constants.py:114-125).
DC_FEATURES = [
    'rows',
    'label',
    'num_passes',
    'window_pos',
    'name',
    'ccs_base_quality_scores',
    'ec',
    'np_num_passes',
    'rq',
    'rg',
]

EMPTY_QUAL = 0

MAIN_EVAL_METRIC_NAME = 'eval/per_example_accuracy'
