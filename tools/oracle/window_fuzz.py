# Full windowing/featurization fuzz: reference DcExample vs my ZmwStack on
# random synthetic ZMWs (training + inference mode, fixed + smart windows).
import sys, types, os, dataclasses
os.environ['JAX_PLATFORMS']='cpu'
fake = types.ModuleType('pysam')
for i,name in enumerate(['CMATCH','CINS','CDEL','CREF_SKIP','CSOFT_CLIP','CHARD_CLIP','CPAD','CEQUAL','CDIFF','CBACK']):
    setattr(fake, name, i)
fake.set_verbosity = lambda *a: 0
fake.AlignmentFile = object; fake.FastaFile = object; fake.FastxFile = object
class _FakeAlignedSegment: pass
fake.AlignedSegment = _FakeAlignedSegment
lib = types.ModuleType('pysam.libcalignedsegment'); lib.AlignedSegment = _FakeAlignedSegment
fake.libcalignedsegment = lib
sys.modules['pysam'] = fake; sys.modules['pysam.libcalignedsegment'] = lib
_orig_get_field = dataclasses._get_field
def _patched(cls, a_name, a_type, default_kw_only):
    try: return _orig_get_field(cls, a_name, a_type, default_kw_only)
    except ValueError:
        default = getattr(cls, a_name)
        setattr(cls, a_name, dataclasses.field(default_factory=lambda d=default: d.copy()))
        return _orig_get_field(cls, a_name, a_type, default_kw_only)
dataclasses._get_field = _patched
sys.path.insert(0, '/root/reference')
import numpy as np
from deepconsensus.preprocess import pre_lib as ref_pre
from deepconsensus.utils import dc_constants as ref_const
import jax; jax.config.update('jax_platforms','cpu')
sys.path.insert(0, '/root/repo')
from deepconsensus_tpu import constants
from deepconsensus_tpu.preprocess import windows as my_windows
from deepconsensus_tpu.preprocess.reads import AlignedRead

rng = np.random.default_rng(int(sys.argv[1]) if len(sys.argv)>1 else 1)
M, I, D, N = 0, 1, 2, 3
MAXP, MAXL = 6, 20  # small dims so overflow/padding paths get exercised

def random_expanded(n_matches, p_ins=0.25):
    out=[]
    for _ in range(n_matches):
        while rng.random() < p_ins:
            out.extend([I]*rng.integers(1,3))
        out.append(int(rng.choice([M, D])))
    if rng.random()<0.3:
        out.extend([I]*rng.integers(1,3))
    return np.array(out, np.uint8)

def make_pair(cigar, is_label, tag, sn):
    n = len(cigar)
    consumes_q = np.isin(cigar, [0,1,7,8])
    bases_ch = np.where(consumes_q, rng.choice([65,67,71,84], n), 32).astype(np.uint8)
    n_adv = int(np.isin(cigar, list(constants.READ_ADVANCING_OPS)).sum())
    tr = {'contig':'c','begin':50,'end':50+n_adv} if is_label else None
    pw=(rng.integers(1,250,n)).astype(np.uint8); ip=(rng.integers(1,250,n)).astype(np.uint8)
    bq = rng.integers(1,93,n) if tag=='ccs' else None
    strand = int(rng.choice([1,2])) if tag not in ('ccs','truth') else 0
    mine = AlignedRead(name=f'm/1/{tag}', bases=bases_ch.copy(), cigar=cigar.copy(),
        pw=pw.copy(), ip=ip.copy(), sn=sn.copy(), strand=strand,
        ccs_idx=np.arange(n, dtype=np.int64),
        base_quality_scores=bq.astype(np.int64) if bq is not None else np.empty(0,np.int64),
        truth_range=dict(tr) if tr else None,
        ec=1.5, np_num_passes=3, rq=0.99, rg='rg')
    theirs = ref_pre.Read(name=f'm/1/{tag}',
        bases=np.array([chr(c) for c in bases_ch]), cigar=cigar.copy(),
        pw=pw.copy(), ip=ip.copy(), sn=sn.copy(),
        strand=ref_const.Strand(strand), ccs_idx=np.arange(n),
        base_quality_scores=bq if bq is not None else np.empty(0,dtype=np.uint8),
        truth_range=dict(tr) if tr else None,
        ec=1.5, np_num_passes=3, rq=0.99, rg='rg')
    return mine, theirs

fails = checked = 0
for trial in range(40):
    n_reads = int(rng.integers(1, 10))  # can exceed MAXP
    with_label = bool(rng.random()<0.5)
    ccs_len = int(rng.integers(25, 70))
    sn = rng.random(4).astype(np.float32)*10
    mines=[]; theirs=[]
    for k in range(n_reads):
        c = random_expanded(int(rng.integers(5, ccs_len)))
        a,b = make_pair(c, False, str(k), sn); mines.append(a); theirs.append(b)
    a,b = make_pair(np.full(ccs_len, M, np.uint8), False, 'ccs', sn); mines.append(a); theirs.append(b)
    if with_label:
        c = random_expanded(int(rng.integers(5, ccs_len)))
        a,b = make_pair(c, True, 'truth', sn); mines.append(a); theirs.append(b)
    smart = rng.random() < 0.3
    ww = None
    if smart:
        # widths over CCS bases summing to ccs_len
        widths=[]; left=ccs_len
        while left>0:
            w=int(min(left, rng.integers(5, MAXL+8)))
            widths.append(w); left-=w
        ww = np.array(widths)

    my_stack = my_windows.subreads_to_zmw_stack(mines, 'm/1/ccs', my_windows.DcConfig(MAXP, MAXL, False), ww)
    my_wins = list(my_stack.iter_windows())

    ref_sp = ref_pre.space_out_subreads(theirs)
    ref_dc = ref_pre.DcExample('m/1/ccs', ref_sp, ref_pre.DcConfig(MAXP, MAXL, False), window_widths=ww)
    ref_wins = []
    for ex in ref_dc.iter_examples():
        ref_wins.append(ex.to_features_dict())

    if len(my_wins) != len(ref_wins):
        fails+=1; print(f'TRIAL {trial}: window count {len(my_wins)} vs {len(ref_wins)} (smart={smart})'); continue
    # counters
    if dict(my_stack.counter) != dict(ref_dc.counter):
        fails+=1; print(f'TRIAL {trial}: counters differ\n mine {dict(my_stack.counter)}\n ref  {dict(ref_dc.counter)}'); continue
    for i,(mw, rw) in enumerate(zip(my_wins, ref_wins)):
        ok = (np.array_equal(mw.subreads, rw['subreads'])
              and mw.num_passes == rw['subreads/num_passes']
              and mw.window_pos == rw['window_pos']
              and np.array_equal(mw.ccs_base_quality_scores, rw['ccs_base_quality_scores'])
              and mw.overflow == rw['overflow'])
        if with_label:
            ref_label = ref_dc  # labels only via tf_example; compare via iter again below
        if not ok:
            fails+=1
            d = np.argwhere(mw.subreads != rw['subreads'])
            print(f'TRIAL {trial} win {i} MISMATCH (smart={smart}); first diffs {d[:3].tolist()}')
            break
        checked += 1
    # training labels: compare via tf_example bytes decode of reference
    if with_label:
        ref_labels = []
        for ex in ref_dc.iter_examples():
            ref_labels.append(ex.label.bases_encoded if ex.is_training else None)
        for mw, rl in zip(my_wins, ref_labels):
            if mw.label is None and rl is None: continue
            if (mw.label is None) != (rl is None) or not np.array_equal(mw.label, rl):
                fails+=1; print(f'TRIAL {trial}: label mismatch'); break
print(f'RESULT: checked {checked} windows;', 'ALL MATCH' if fails==0 else f'{fails} mismatches')
