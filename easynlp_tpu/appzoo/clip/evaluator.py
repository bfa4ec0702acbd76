"""CLIP evaluator: in-batch text↔image retrieval recall@K (reference
easynlp/appzoo/clip/evaluator.py), plus the pair cosine-similarity report
mode (`cosine_similarity=True`, reference
easynlp/appzoo/wukong_clip/evaluator.py:32-60 / examples/clip_score)."""

import numpy as np

from easynlp_tpu.core.evaluator import Evaluator


class CLIPEvaluator(Evaluator):
    def __init__(self, valid_dataset, **kwargs):
        kwargs.pop("multi_label", None)
        super().__init__(valid_dataset, **kwargs)
        udp = getattr(self.args, "user_defined_parameters_dict", None) or {}
        self.cal_sim = str(udp.get("cosine_similarity", "")) == "True"

    def evaluate(self, app):
        import jax
        text_embs, image_embs = [], []
        for batch in self.valid_loader:
            valid = batch.pop("_valid").astype(bool)
            out = jax.device_get(self.forward(app, batch))
            text_embs.append(np.asarray(out["text_embeds"],
                                        np.float32)[valid])
            image_embs.append(np.asarray(out["image_embeds"],
                                         np.float32)[valid])
        t = np.concatenate(text_embs)
        v = np.concatenate(image_embs)
        sim = t @ v.T  # [N, N]; gold is the diagonal
        if self.cal_sim:
            # CLIP-score mode: report per-pair cosine similarity of the
            # aligned (text, image) rows — embeddings are already L2
            # normalised by the tower forward.
            pair_sim = np.diag(sim)
            print("pair number: ", pair_sim.shape)
            print(pair_sim)
            print("averaged cosine similarity ", float(pair_sim.mean()))
            return [("cosine_similarity", float(pair_sim.mean()))]
        ranks_t2i = (sim >= np.diag(sim)[:, None]).sum(-1)  # rank of gold
        ranks_i2t = (sim.T >= np.diag(sim)[:, None]).sum(-1)
        results = []
        for k in (1, 5, 10):
            results.append(("t2i_r%d" % k, float((ranks_t2i <= k).mean())))
        for k in (1, 5, 10):
            results.append(("i2t_r%d" % k, float((ranks_i2t <= k).mean())))
        results.insert(0, ("mean_recall",
                           float(np.mean([r for _, r in results]))))
        return results
