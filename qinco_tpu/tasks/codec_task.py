"""Codec and two-stage-search CLI surfaces (QINCo1-era drivers).

Reference: qinco_v1/codec_qinco.py (encode/decode files, raw bit-packed
or .npy) and qinco_v1/search_2stage.py (AQ-shortlist + QINCo rerank
demo) — exposed here as tasks ``encode_codec`` / ``decode_codec`` /
``search_2stage`` instead of standalone argparse scripts.
"""

from __future__ import annotations

import json

import numpy as np

from ..codec import read_codes_file, write_codes_file
from ..data.datasets import load_queries_data, load_vec_db, load_vec_trainset
from ..models.qinco import decode_raw, encode_chunked
from .base import BaseTask


class EncodeCodecTask(BaseTask):
    """Encode a vector file into a codes file
    (reference: codec_qinco.py encode branch, :120-140).

    ``output`` ending in ``.npy`` stores int32 codes (the reference's
    non-raw mode); any other extension writes the self-describing
    bit-packed format (qinco_tpu/codec.py — the faiss
    ``pack_bitstrings`` analog).
    """

    def setup(self):
        super().setup()
        assert self.cfg.model, "Specify 'model'"
        assert self.cfg.output, "Specify 'output' (.npy or packed codes file)"

    def load_data(self):
        self.db_vecs, _ = load_vec_db(self.cfg)
        self.data_dim = self.db_vecs.shape[-1]
        self.print(f"Input vectors: {self.db_vecs.shape}")

    def run(self):
        cfg = self.cfg
        codes = encode_chunked(
            self.params, self.spec, self.db_vecs, batch=cfg.batch,
            enc_max_bs=cfg.enc_max_bs,
        )  # (M_ivf, N)
        if str(cfg.output).endswith(".npy"):
            np.save(cfg.output, codes.T.astype(np.int32))
            self.print(f"Stored codes {codes.T.shape} in {cfg.output}")
        else:
            # Uniform nbits packing covers the non-IVF codec contract;
            # an IVF step-0 code would need its own width.
            assert not self.spec.ivf_in_use, (
                "raw bit-packing supports flat models only; use a .npy "
                "output for IVF models"
            )
            write_codes_file(cfg.output, codes, self.spec.K)
            nbits = max(1, int(np.ceil(np.log2(self.spec.K))))
            self.print(
                f"Packed {codes.shape[1]} vectors × {codes.shape[0]} codes "
                f"@ {nbits} bits into {cfg.output}"
            )
        return codes


class DecodeCodecTask(BaseTask):
    """Decode a codes file back to vectors
    (reference: codec_qinco.py decode branch, :142-159).

    Input via ``encoded_db`` (codes ``.npy`` or packed file);
    output is a ``.npy`` vector file.
    """

    def setup(self):
        super().setup()
        assert self.cfg.model, "Specify 'model'"
        assert self.cfg.encoded_db, "Specify 'encoded_db' (codes file)"
        assert self.cfg.output and str(self.cfg.output).endswith(".npy"), (
            "Specify a .npy output"
        )

    def load_data(self):
        pass  # dimension comes from the checkpoint

    def run(self):
        import jax.numpy as jnp

        cfg = self.cfg
        path = str(cfg.encoded_db)
        if path.endswith(".npy"):
            codes = np.load(path).astype(np.int32)  # (N, M)
        else:
            codes, K = read_codes_file(path)
            assert K == self.spec.K, f"codes file K={K} vs model K={self.spec.K}"
        assert codes.shape[1] == self.spec.M_ivf, (
            f"codes have {codes.shape[1]} steps, model expects {self.spec.M_ivf}"
        )
        self.print(f"Decoding {codes.shape[0]} vectors")
        out = []
        bs = cfg.batch
        for i in range(0, len(codes), bs):
            chunk = codes[i : i + bs]
            n_valid = len(chunk)
            if n_valid < bs:
                chunk = np.concatenate(
                    [chunk, np.zeros((bs - n_valid, chunk.shape[1]), np.int32)]
                )
            x = decode_raw(self.params, self.spec, jnp.asarray(chunk.T))
            out.append(np.asarray(x)[:n_valid])
        y = np.concatenate(out)
        np.save(cfg.output, y)
        self.print(f"Stored vectors {y.shape} in {cfg.output}")
        return y


class TwoStageSearchTask(BaseTask):
    """Flat two-stage search: AQ-LUT shortlist over the whole DB, QINCo
    decode + exact rerank of the top ``nshort``
    (reference: qinco_v1/search_2stage.py).

    ``search.nshort`` holds *literal* shortlist sizes here (the
    reference sweeps kshort = 10..1000).
    """

    NEEDS_TRAIN_DATA = True

    def setup(self):
        super().setup()
        assert self.cfg.model, "Specify 'model'"

    def load_data(self):
        cfg = self.cfg
        (self.train_vecs, _), _ = load_vec_trainset(cfg)
        self.db_vecs, _ = load_vec_db(cfg)
        self.xq, self.xq_gt = load_queries_data(cfg)
        self.data_dim = self.db_vecs.shape[-1]

    def run(self):
        from ..ops.aq import compute_fixed_aq_codebooks
        from ..search.two_stage import run_search_two_stage

        cfg, spec = self.cfg, self.spec
        assert not spec.ivf_in_use, (
            "search_2stage is the flat (no-IVF) driver; use task=search "
            "with an index for IVF models"
        )

        self.print("Encoding trainset for the AQ fit")
        xt = np.asarray(self.train_vecs, np.float32)
        xt_codes = encode_chunked(
            self.params, spec, xt, batch=cfg.batch, enc_max_bs=cfg.enc_max_bs
        )  # (M, nt)
        codebooks = compute_fixed_aq_codebooks(xt, xt_codes.T, k=spec.K)

        self.print("Encoding database")
        db_codes = encode_chunked(
            self.params, spec, self.db_vecs, batch=cfg.batch,
            enc_max_bs=cfg.enc_max_bs,
        )

        results = {}
        nshorts = sorted(int(v) for v in cfg.search.nshort) or [100]
        for nshort in nshorts:
            nshort = max(nshort, 100)
            _, recalls = run_search_two_stage(
                self.params, spec, db_codes, codebooks,
                np.asarray(self.xq, np.float32), np.asarray(self.xq_gt),
                nshort=nshort, decode_batch=cfg.search.batch_size,
                log=self.print,
            )
            results[nshort] = {str(k): v for k, v in recalls.items()}
            self.print(f"nshort={nshort}: {results[nshort]}")
        if cfg.output:
            with open(cfg.output, "w") as f:
                json.dump(results, f)
        return results
