"""Golden-value parity with the reference on the dated fluA JC69 model.

Expected values are the hard-coded goldens of the reference's
tests/test_tree_likelihood.c:29-131 (logP, clock-rate gradient, all 67 ratio
gradients, root-height gradient, with and without the ratio-transform
log-Jacobian).
"""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from physher_tpu.data.sitepattern import SitePattern
from physher_tpu.io.seqio import read_alignment
from physher_tpu.io.treeio import read_newick
from physher_tpu.models.clock import StrictClock
from physher_tpu.models.substitution import JC69
from physher_tpu.models.treelikelihood import TreeLikelihood
from physher_tpu.trees.timetree import TimeTreeData

EXPECTED_LOGP = -4777.616349713985
EXPECTED_LOGP_JAC = -4786.867701371271
EXPECTED_RATE_GRAD = 328017.6732813406
EXPECTED_ROOT_GRAD = 17.492484957839924
EXPECTED_ROOT_GRAD_JAC = 19.936860572419484

EXPECTED_RATIO_GRAD = [
    -0.5936536642214764, 6.441289658869611, 8.92145177998445,
    5.173924439035883, -5.1189486033502325, 2.7314018967274634,
    2.007882472548766, 3.956031262797951, 5.542287760475186,
    9.56623809386586, 15.27690567000365, 35.18003581182256,
    73.00436877780763, 96.69564894572747, 14.99114774606325,
    15.285818508377771, -1.3363345353505567, 10.94108984814406,
    19.64314696205841, 21.460133409615363, 39.1394523375063,
    3.637275922119337, 11.269174317983369, 12.443235860074363,
    71.12758013218424, -3.8069961277876336, 88.1258829065779,
    3.5996001830340103, 18.479485706097613, 6.036534490720715,
    19.841103281559672, 23.24734623488343, 22.7331642319324,
    1.8172474126372273, 9.368306385819489, 54.08739297309535,
    42.35386071758409, 10.679777674119268, 4.140801615932186,
    3.3305556707250425, -4.622247216603871, 27.32069418310099,
    54.31412932090593, 152.27137882559083, 23.540874887614432,
    14.3065705842615, 1.2225681560992132, 16.980030076368237,
    26.38017246149551, 3.4861149347888336, 4.098873332100652,
    10.267812216719863, 15.592298788222287, 70.94321518451146,
    4.240029132899654, 6.016353791291106, 38.343497684323275,
    3.4885156350078015, 66.51533636215693, 7.694985489230656,
    5.883423757661899, 3.981016102813299, 5.47007162703107,
    40.51912724901265, 30.451660702191045, 2.840830939900187,
    6.802521820384058,
]

EXPECTED_RATIO_GRAD_JAC = [
    -0.5936536642214764, 6.441289658869611, 11.202945298115116,
    5.173924439035883, -0.9046311891428063, 2.7314018967274634,
    3.1571313705195485, 7.082913909386436, 10.305417331645046,
    13.988205820544293, 20.709336065224214, 48.897992914081215,
    99.16494936812502, 130.20574669099852, 17.314018642574176,
    21.033289555358838, -1.3363345353505567, 12.259822362587805,
    22.88729131298567, 27.17656445923329, 47.48742627517851,
    3.637275922119337, 12.955169498485168, 15.31595344286499,
    83.25460505860441, -3.8069961277876336, 105.38509458853852,
    4.874022850066035, 22.754466304821086, 6.036534490720715,
    25.651478211887106, 29.535185027483895, 29.598789450352278,
    1.8172474126372273, 10.598684711100873, 76.25924840292916,
    56.481422939218746, 10.679777674119268, 6.5871791334230085,
    3.3305556707250425, -4.622247216603871, 33.41730442097831,
    63.4157671002785, 188.80951477041825, 23.540874887614432,
    17.42107593719064, 1.2225681560992132, 22.37201215315777,
    34.239511260483326, 3.4861149347888336, 4.098873332100652,
    13.200954262988732, 19.726890439483917, 96.80873776982577,
    4.240029132899654, 7.414584510049101, 48.87169351223057,
    3.4885156350078015, 82.96906517317022, 9.009333759946228,
    8.032474365132352, 3.981016102813299, 6.543650266561743,
    53.70242275637265, 37.835952010113665, 2.840830939900187,
    7.517186267961684,
]


@pytest.fixture(scope="module")
def model(data_dir):
    with open(os.path.join(data_dir, "jc69-time.json")) as fh:
        cfg = json.load(fh)
    tree_cfg = cfg["model"]["tree"]
    topo, distances = read_newick(tree_cfg["newick"])
    td = TimeTreeData.from_dated_tree(topo, distances, tree_cfg["dates"])
    seqs = read_alignment(os.path.join(data_dir, "fluA.fa"))
    sp = SitePattern.from_alignment(seqs, "nucleotide")
    assert sp.pattern_count == 238
    tlk = TreeLikelihood(
        sp, topo, JC69(), clock=StrictClock(topo.N, rate_init=1e-3),
        time_data=td, tipstates=True,
    )
    params = tlk.param_space().init_params()
    return tlk, params


def test_logp(model):
    tlk, params = model
    logP = jax.jit(tlk.log_likelihood_only)(params)
    np.testing.assert_allclose(float(logP), EXPECTED_LOGP, rtol=0, atol=1e-8)


def test_logp_with_jacobian(model):
    tlk, params = model
    logP = jax.jit(lambda p: tlk.log_likelihood_only(p) + tlk.log_jacobian(p))(
        params)
    np.testing.assert_allclose(float(logP), EXPECTED_LOGP_JAC, rtol=0,
                               atol=1e-8)


def test_gradients(model):
    tlk, params = model
    grad = jax.jit(jax.grad(tlk.log_likelihood_only))(params)
    np.testing.assert_allclose(float(grad["rate"]), EXPECTED_RATE_GRAD,
                               rtol=1e-10)
    np.testing.assert_allclose(np.asarray(grad["tree.ratios"]),
                               EXPECTED_RATIO_GRAD, rtol=0, atol=1e-7)
    np.testing.assert_allclose(float(grad["tree.root_height"]),
                               EXPECTED_ROOT_GRAD, rtol=0, atol=1e-8)


def test_gradients_with_jacobian(model):
    tlk, params = model
    fn = lambda p: tlk.log_likelihood_only(p) + tlk.log_jacobian(p)  # noqa: E731
    grad = jax.jit(jax.grad(fn))(params)
    np.testing.assert_allclose(float(grad["rate"]), EXPECTED_RATE_GRAD,
                               rtol=1e-10)
    np.testing.assert_allclose(np.asarray(grad["tree.ratios"]),
                               EXPECTED_RATIO_GRAD_JAC, rtol=0, atol=1e-7)
    np.testing.assert_allclose(float(grad["tree.root_height"]),
                               EXPECTED_ROOT_GRAD_JAC, rtol=0, atol=1e-8)
