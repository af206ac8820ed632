"""PPMI word vectors: cooccurrence -> PPMI weighting -> PCA projection,
tied end-to-end against a serial numpy reference."""

import numpy as np
import pyarrow as pa

import ray.data

from duke_ray.stages.wordvec import _ppmi_milli, context_vocab, ppmi_pca, ppmi_vectors

TEXTS = [
    "the cat sat on the mat",
    "the dog sat on the rug",
    "a cat and a dog met",
    "the cat chased the dog",
    "dogs and cats and mats",
] * 6


def _serial_pairs(texts, window, min_count):
    from collections import Counter

    uni, pairs, total = Counter(), Counter(), 0
    for t in texts:
        toks = t.split(" ")
        total += len(toks)
        uni.update(toks)
        for i in range(len(toks)):
            for d in range(1, window + 1):
                j = i + d
                if j < len(toks) and toks[i] != toks[j]:
                    a, b = sorted((toks[i], toks[j]))
                    pairs[(a, b)] += 1
    return (
        {
            (a, b): (n_ab, uni[a], uni[b], n_ab * total * 1000 // (uni[a] * uni[b]))
            for (a, b), n_ab in pairs.items()
            if n_ab >= min_count
        },
        uni,
    )


def _serial_ppmi_matrix(pairs, n_context):
    """tokens (sorted), context dims (top-C by unigram desc / token asc
    among pair participants), dense PPMI-milli/1000 matrix."""
    uni = {}
    for (a, b), (n_ab, n_a, n_b, lift) in pairs.items():
        uni[a] = n_a
        uni[b] = n_b
    ctx = sorted(uni, key=lambda t: (-uni[t], t))[:n_context]
    dim = {t: i for i, t in enumerate(ctx)}
    toks = sorted(uni)
    mat = np.zeros((len(toks), len(ctx)))
    for (a, b), (_n, _na, _nb, lift) in pairs.items():
        p = (
            np.floor(1000.0 * np.log(lift / 1000.0) + 0.5) / 1000.0
            if lift > 1000
            else 0.0
        )
        if b in dim:
            mat[toks.index(a), dim[b]] = p
        if a in dim:
            mat[toks.index(b), dim[a]] = p
    return toks, ctx, mat


def _ds(texts, blocks=4):
    return ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": pa.array(texts, pa.string()),
            }
        )
    ).repartition(blocks)


def test_ppmi_milli_formula():
    lm = np.array([0, 500, 1000, 1001, 2000, 2718282], np.int64)
    got = _ppmi_milli(lm)
    assert got[0] == 0 and got[1] == 0 and got[2] == 0
    assert got[3] == round(1000 * np.log(1.001))
    assert got[4] == round(1000 * np.log(2.0))
    assert got[5] == round(1000 * np.log(2718.282))


def test_ppmi_vectors_match_serial(ray_session):
    from duke_ray.stages.textstats import cooccurrence

    pairs_ds = cooccurrence(_ds(TEXTS), window=2, min_count=2).materialize()
    want_pairs, _ = _serial_pairs(TEXTS, 2, 2)
    toks, ctx, mat = _serial_ppmi_matrix(want_pairs, n_context=5)

    assert context_vocab(pairs_ds, n_context=5) == ctx
    got = ppmi_vectors(pairs_ds, n_context=5).to_pandas()
    assert sorted(got["token"]) == toks
    assert got["vec_id"].nunique() == len(toks)
    got = got.set_index("token")
    for i, t in enumerate(toks):
        np.testing.assert_allclose(
            np.asarray(got.loc[t, "embedding"], np.float64), mat[i], atol=0
        )


def test_ppmi_pca_end_to_end_matches_serial(ray_session):
    want_pairs, _ = _serial_pairs(TEXTS, 2, 2)
    toks, ctx, mat = _serial_ppmi_matrix(want_pairs, n_context=5)

    proj, model = ppmi_pca(
        _ds(TEXTS), k=3, window=2, min_count=2, n_context=5, return_model=True
    )
    df = proj.to_pandas()
    tok_map = model["tokens"].to_pandas().set_index("vec_id")["token"]

    # serial PCA on the same quantized matrix (pca_project quant=1000,
    # PPMI already milli-quantized -> quantization is lossless here)
    mu = mat.mean(axis=0)
    cov = (mat - mu).T @ (mat - mu) / (len(mat) - 1)
    evals, evecs = np.linalg.eigh(cov)
    order = np.argsort(evals)[::-1][:3]
    w = evecs[:, order]
    flip = np.sign(w[np.argmax(np.abs(w), axis=0), np.arange(w.shape[1])])
    flip[flip == 0] = 1.0
    ref = (mat - mu) @ (w * flip)

    np.testing.assert_allclose(
        np.sort(model["eigenvalues"])[::-1], np.sort(evals[order])[::-1], rtol=1e-8
    )
    got_mat = (
        df.assign(token=df["vec_id"].map(tok_map))
        .pivot(index="token", columns="comp", values="coord_micro")
        .loc[toks]
        .to_numpy()
        / 1e6
    )
    np.testing.assert_allclose(got_mat, ref, atol=2e-6)

    # determinism across block counts
    proj2 = ppmi_pca(_ds(TEXTS, blocks=9), k=3, window=2, min_count=2, n_context=5)
    a = proj.to_pandas().sort_values(["vec_id", "comp"]).reset_index(drop=True)
    b = proj2.to_pandas().sort_values(["vec_id", "comp"]).reset_index(drop=True)
    assert a.equals(b)


def test_ppmi_vectors_empty_pairs(ray_session):
    from duke_ray.stages.textstats import cooccurrence

    pairs = cooccurrence(_ds(["solo words only once"], blocks=1), min_count=5).materialize()
    assert pairs.count() == 0
    assert context_vocab(pairs, n_context=4) == []
    assert ppmi_vectors(pairs, n_context=4).count() == 0
