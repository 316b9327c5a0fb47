import sys, types, os, dataclasses
os.environ['JAX_PLATFORMS']='cpu'
# pysam stub
fake = types.ModuleType('pysam')
for i,name in enumerate(['CMATCH','CINS','CDEL','CREF_SKIP','CSOFT_CLIP','CHARD_CLIP','CPAD','CEQUAL','CDIFF','CBACK']):
    setattr(fake, name, i)
fake.set_verbosity = lambda *a: 0
fake.AlignmentFile = object
fake.FastaFile = object
fake.FastxFile = object
fake.qualitystring_to_array = lambda s: s
class _FakeAlignedSegment: pass
fake.AlignedSegment = _FakeAlignedSegment
lib = types.ModuleType('pysam.libcalignedsegment'); lib.AlignedSegment = _FakeAlignedSegment
fake.libcalignedsegment = lib
sys.modules['pysam'] = fake; sys.modules['pysam.libcalignedsegment'] = lib
# py3.12 mutable-default shim for the reference dataclasses
_orig_get_field = dataclasses._get_field
def _patched(cls, a_name, a_type, default_kw_only):
    try:
        return _orig_get_field(cls, a_name, a_type, default_kw_only)
    except ValueError:
        default = getattr(cls, a_name)
        setattr(cls, a_name,
                dataclasses.field(default_factory=lambda d=default: d.copy()))
        return _orig_get_field(cls, a_name, a_type, default_kw_only)
dataclasses._get_field = _patched
sys.path.insert(0, '/root/reference')
import numpy as np
from deepconsensus.preprocess import pre_lib as ref_pre
from deepconsensus.utils import dc_constants as ref_const
import jax; jax.config.update('jax_platforms','cpu')
sys.path.insert(0, '/root/repo')
from deepconsensus_tpu import constants
from deepconsensus_tpu.preprocess import spacing as my_spacing
from deepconsensus_tpu.preprocess.reads import AlignedRead

rng = np.random.default_rng(int(sys.argv[1]) if len(sys.argv)>1 else 123)
M, I, D, N = 0, 1, 2, 3

def random_expanded(n_matches, p_ins=0.3):
    out=[]
    for _ in range(n_matches):
        while rng.random() < p_ins:
            out.extend([I]*rng.integers(1,4))
        out.append(int(rng.choice([M, D, N])))
    if rng.random()<0.4:
        out.extend([I]*rng.integers(1,4))
    return np.array(out, np.uint8)

def make_pair(cigar, is_label, tag):
    n = len(cigar)
    consumes_q = np.isin(cigar, [0,1,7,8])
    bases_ch = np.where(consumes_q, rng.choice([65,67,71,84], n), 32).astype(np.uint8)
    n_adv = int(np.isin(cigar, list(constants.READ_ADVANCING_OPS)).sum())
    tr = {'contig':'c','begin':50,'end':50+n_adv} if is_label else None
    pw=(np.arange(n)%251).astype(np.uint8); ip=((np.arange(n)*3)%251).astype(np.uint8)
    bq = (np.arange(n)%90+1) if tag=='ccs' else None
    mine = AlignedRead(name=f'm/1/{tag}', bases=bases_ch.copy(), cigar=cigar.copy(),
        pw=pw.copy(), ip=ip.copy(), sn=np.zeros(4), strand=1,
        ccs_idx=np.arange(n, dtype=np.int64),
        base_quality_scores=bq.astype(np.int64) if bq is not None else np.empty(0,np.int64),
        truth_range=dict(tr) if tr else None)
    theirs = ref_pre.Read(name=f'm/1/{tag}',
        bases=np.array([chr(c) for c in bases_ch]), cigar=cigar.copy(),
        pw=pw.copy(), ip=ip.copy(), sn=np.zeros(4), strand=ref_const.Strand(1),
        ccs_idx=np.arange(n),
        base_quality_scores=bq if bq is not None else np.empty(0,dtype=np.uint8),
        truth_range=dict(tr) if tr else None)
    return mine, theirs

fails=0
for trial in range(60):
    n_reads = int(rng.integers(1,7))
    with_label = bool(rng.random()<0.6)
    mines=[]; theirs=[]
    for k in range(n_reads):
        c = random_expanded(int(rng.integers(1,50)))
        a,b = make_pair(c, False, str(k)); mines.append(a); theirs.append(b)
    ccs_c = np.full(int(rng.integers(30,60)), M, np.uint8)
    a,b = make_pair(ccs_c, False, 'ccs'); mines.append(a); theirs.append(b)
    if with_label:
        c = random_expanded(int(rng.integers(1,50)))
        a,b = make_pair(c, True, 'truth'); mines.append(a); theirs.append(b)
    my_out = my_spacing.space_out_subreads(mines)
    ref_out = ref_pre.space_out_subreads(theirs)
    for i,(m,r) in enumerate(zip(my_out, ref_out)):
        m_b = m.bases.tobytes().decode()
        r_b = ''.join(r.bases)
        ok = (m_b == r_b and np.array_equal(m.pw, r.pw) and np.array_equal(m.ip, r.ip)
              and np.array_equal(m.ccs_idx, r.ccs_idx))
        if m.is_label:
            ok = ok and np.array_equal(m.truth_idx, r.truth_idx) and np.array_equal(m.cigar, r.cigar)
        if m.base_quality_scores.size and np.asarray(r.base_quality_scores).size:
            ok = ok and np.array_equal(m.base_quality_scores, np.asarray(r.base_quality_scores))
        if not ok:
            fails+=1
            print(f'TRIAL {trial} read {i} MISMATCH (label={m.is_label})')
            print(' mine:', repr(m_b[:100]))
            print(' ref :', repr(r_b[:100]))
            break
print('RESULT:', 'ALL MATCH (60 trials)' if fails==0 else f'{fails} mismatches')
