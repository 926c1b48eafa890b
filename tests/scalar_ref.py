"""Scalar, literal re-derivation of the reference device code
(/root/reference/resources/renderer.cl) in plain numpy, used ONLY as a test
oracle: each function transcribes the OpenCL semantics per-ray with real
`while` loops so the vectorized JAX renderer can be validated against it
pixel by pixel.

Everything is float32 (numpy NEP-50 weak scalars keep python-float literals
from upcasting) to track the device math closely.
"""

from __future__ import annotations

import numpy as np

F = np.float32


def v3(*a):
    return np.array(a, dtype=F) if len(a) > 1 else np.asarray(a[0], dtype=F)


def norm3(v):
    return np.sqrt(F(v @ v))


def normalize(v):
    # OpenCL normalize() of a zero vector is undefined; both the production
    # renderer and this oracle standardize on the +y fallback.
    n = norm3(v)
    return v / n if n > 1e-12 else v3(0.0, 1.0, 0.0)


def rand_float4(table, seed):
    # renderer.cl:142-144
    return table[int(np.uint32(seed) & np.uint32(0x3FFF))]


def dist_union(a, b):
    # renderer.cl:146-148
    return a if a[0] < b[0] else b


def intersects_box(bmin, bmax, p, d):
    # renderer.cl:153-161
    with np.errstate(divide="ignore", invalid="ignore"):
        omin = (bmin - p) / d
        omax = (bmax - p) / d
    lo = np.fmin(omax, omin)
    hi = np.fmax(omax, omin)
    a = max(max(lo[0], F(0.0)), max(lo[1], lo[2]))
    b = min(hi[0], min(hi[1], hi[2]))
    return a if b > a else F(-1.0)


class Scene:
    def __init__(self, opts, vol, table):
        self.o = opts  # dict of numpy values
        self.vol = vol  # flat uint8
        self.table = np.asarray(table, dtype=F)

    # --- voxel sampling -------------------------------------------------
    def voxel_lookup(self, p):
        # renderer.cl:163-170
        rx, ry, rz, rxy = self.o["voxelRes"]
        q = (p * v3(rx, ry, rz)).astype(np.int32)  # trunc toward zero
        if 0 <= q[2] < rz and 0 <= q[1] < ry and 0 <= q[0] < rx:
            return int(self.vol[q[2] * rxy + q[1] * rx + q[0]])
        return -1

    def voxel_lookup_i(self, q):
        # renderer.cl:172-178
        rx, ry, rz, rxy = self.o["voxelRes"]
        if 0 <= q[2] < rz and 0 <= q[1] < ry and 0 <= q[0] < rx:
            return F(1.0) if self.vol[q[2] * rxy + q[1] * rx + q[0]] >= self.o["isoVal"] else F(0.0)
        return F(0.0)

    def voxel_normal(self, q):
        # renderer.cl:180-188
        nx = self.voxel_lookup_i(q + [1, 0, 0]) - self.voxel_lookup_i(q - [1, 0, 0])
        ny = self.voxel_lookup_i(q + [0, 1, 0]) - self.voxel_lookup_i(q - [0, 1, 0])
        nz = self.voxel_lookup_i(q + [0, 0, 1]) - self.voxel_lookup_i(q - [0, 0, 1])
        return -v3(nx, ny, nz)

    def voxel_normal_smooth(self, q):
        # renderer.cl:190-203
        n = v3(0.0, 0.0, 0.0)
        for z in (-1, 0, 1):
            for y in (-1, 0, 1):
                for x in (-1, 0, 1):
                    qq = q + np.array([x, y, z], dtype=np.int32)
                    if self.voxel_lookup_i(qq) > 0.0:
                        n = n + self.voxel_normal(qq)
        return normalize(n)

    @staticmethod
    def voxel_material(v):
        # renderer.cl:205-207
        return F(1.0) if v < 84 else (F(2.0) if v < 168 else F(3.0))

    # --- marching --------------------------------------------------------
    def distance_to_scene(self, isec, rpos, rdir, steps, smooth):
        # renderer.cl:209-237
        o = self.o
        gd = F(rpos[1] + o["groundY"])
        res = dist_union((gd, gd), (F(1e5), F(-1.0)))
        isec["normal"] = v3(0.0, 1.0, 0.0) if res[0] < 1e5 else -rdir
        idist = intersects_box(o["voxelBoundsMin"], o["voxelBoundsMax"], rpos, rdir)
        if idist >= 0.0 and idist < res[0]:
            delta = rdir / F(steps * 0.5) * o["invVoxelScale"]
            p = rpos + o["voxelBounds"]
            if idist > 0.0:
                p = rdir * idist + p
            p = p * o["invVoxelScale"]
            s = steps
            while True:
                s -= 1
                if s < 0:
                    break
                v = self.voxel_lookup(p)
                if v < 0:
                    break
                if v > o["isoVal"]:
                    rx, ry, rz, _ = o["voxelRes"]
                    q = (p * v3(rx, ry, rz)).astype(np.int32)
                    if smooth:
                        isec["normal"] = self.voxel_normal_smooth(q)
                    else:
                        isec["normal"] = normalize(self.voxel_normal(q))
                    world = p * o["voxelBounds2"] - o["voxelBounds"]
                    return dist_union(
                        (F(norm3(rpos - world) - o["voxelSize"]), self.voxel_material(v)),
                        res,
                    )
                p = p + delta
        return res

    def raymarch(self, ray_pos, ray_dir, isec, max_dist, max_steps, smooth):
        # renderer.cl:239-257
        o = self.o
        isec["distance"] = F(o["startDist"])
        s = max_steps
        while True:
            s -= 1
            if s < 0:
                break
            isec["pos"] = ray_pos + ray_dir * isec["distance"]
            sd = self.distance_to_scene(isec, isec["pos"], ray_dir, o["maxVoxelIter"], smooth)
            # (int)(sceneDist.y): out-of-int32-range float->int is C UB;
            # we pin the saturating behavior (= XLA and convert_int_sat)
            isec["objectID"] = int(np.clip(np.trunc(sd[1]), -(2**31), 2**31 - 1))
            if abs(sd[0]) <= o["eps"] or isec["distance"] >= max_dist:
                break
            isec["distance"] = F(isec["distance"] + sd[0])
        if isec["distance"] >= max_dist:
            isec["pos"] = ray_pos + ray_dir * isec["distance"]
            isec["objectID"] = -1
            isec["distance"] = F(1000.0)

    # --- shading ----------------------------------------------------------
    def sky_gradient(self, d):
        # renderer.cl:259-261
        t = F(d[1] * 0.5 + 0.5)
        return self.o["skyColor1"] + (self.o["skyColor2"] - self.o["skyColor1"]) * t

    def light_pos(self, state, i):
        # renderer.cl:263-269
        o = self.o
        seed = np.uint32(
            np.int32(
                F(
                    state["pixelPos"][0] * F(1957.0)
                    + state["pixelPos"][1] * F(2173.0)
                    + o["time"] * F(4763.742)
                )
            )
        )
        return rand_float4(self.table, seed)[:3] * o["lightScatter"] + o["lightPos"][i][:3]

    def apply_atmosphere(self, state, ray_pos, ray_dir, isec, col):
        # renderer.cl:275-290
        o = self.o
        fa = F(1.0 - np.exp(isec["distance"] * isec["distance"] * -o["fogPow"]))
        col = col + (self.sky_gradient(ray_dir) - col) * fa
        for i in range(o["numLights"]):
            lp = self.light_pos(state, i)
            d = F(np.clip((lp - ray_pos) @ ray_dir, 0.0, isec["distance"]))
            lp = ray_dir * d + (ray_pos - lp)
            col = col + o["lightColor"][i][:3] * F(o["flareAmp"] / (lp @ lp))
        return col

    def shadow(self, p, ldir, ldist):
        # renderer.cl:292-301
        isec = {}
        self.raymarch(p, ldir, isec, ldist, self.o["shadowIter"], False)
        return F(1.0) if isec["distance"] >= ldist else F(0.0)

    @staticmethod
    def schlick(r0, smoothness, normal, view):
        # renderer.cl:304-311
        d = F(np.clip(1.0 - normal @ (-view), 0.0, 1.0))
        if d > 0.0:
            d2 = d * d
            return F((1.0 - r0) * (smoothness * d2 * d2 * d) + r0)
        return F(0.0)

    @staticmethod
    def diffuse_intensity(ldir, normal):
        return F(max(0.0, ldir @ normal))

    @staticmethod
    def blinn_phong(smoothness, ray_dir, light_dir, normal):
        # renderer.cl:317-325
        nh = F(normalize(light_dir - ray_dir) @ normal)
        if nh > 0.0:
            spec_pow = F(np.exp2(6.0 * smoothness + 4.0))
            return F(nh**spec_pow * (spec_pow + 2.0) * 0.125)
        return F(0.0)

    def ambient_occlusion(self, pos, normal):
        # renderer.cl:327-346
        o = self.o
        ao = F(1.0)
        d = F(0.0)
        seed = np.uint32(
            np.int32(
                F(
                    pos[0] * F(3183.75)
                    + pos[1] * F(1831.42)
                    + pos[2] * F(2945.87)
                    + o["time"] * F(2671.918)
                )
            )
        )
        isec = {}
        i = 0
        while i <= o["aoIter"] and ao > 0.01:
            d = F(d + o["aoStepDist"])
            seed = seed + np.uint32(37)
            n = normalize(rand_float4(self.table, seed)[:3] * F(0.2) + normal)
            sd = self.distance_to_scene(isec, n * d + pos, n, o["maxVoxelIter"] // 2, False)
            ao = F(ao * (1.0 - max((d - sd[0]) * o["aoAmp"] / d, F(0.0))))
            i += 1
        return ao

    def object_lighting(self, state, ray_dir, isec, mat, normal, reflect_col):
        # renderer.cl:348-381
        o = self.o
        ao = self.ambient_occlusion(isec["pos"], normal)
        diff = self.sky_gradient(normal) * ao
        spec = reflect_col * ao
        final = v3(0.0, 0.0, 0.0)
        for i in range(o["numLights"]):
            delta = self.light_pos(state, i) - isec["pos"]
            light_dist = F(delta @ delta)
            att = F(1.0 / light_dist)
            if att > o["minLightAtt"]:
                ldir = normalize(delta)
                sf = self.shadow(
                    isec["pos"] + ldir * o["shadowBias"],
                    ldir,
                    F(min(np.sqrt(light_dist) - o["shadowBias"], o["maxDist"])),
                )
                if sf > 0.0:
                    inc = o["lightColor"][i][:3] * sf * att
                    diff = diff + self.diffuse_intensity(ldir, normal) * inc
                    spec = spec + self.blinn_phong(mat["smoothness"], ray_dir, ldir, normal) * inc
            diff = diff * mat["albedo"][:3]  # QUIRK: inside light loop
            s = self.schlick(mat["r0"], mat["smoothness"], normal, ray_dir)
            final = final + (diff + (spec - diff) * s)
        return final / F(o["numLights"])

    def material(self, idx):
        o = self.o
        return {
            "albedo": o["mat_albedo"][idx],
            "r0": F(o["mat_r0"][idx]),
            "smoothness": F(o["mat_smoothness"][idx]),
        }

    def basic_scene_color(self, state, ray_pos, ray_dir, isec):
        # renderer.cl:383-405
        self.raymarch(ray_pos, ray_dir, isec, self.o["maxDist"], self.o["maxIter"], False)
        if isec["objectID"] < 0:
            col = self.sky_gradient(ray_dir)
        else:
            mat = self.material(min(max(isec["objectID"], 0), 3))
            refl = ray_dir - 2.0 * (ray_dir @ isec["normal"]) * isec["normal"]
            col = self.object_lighting(
                state, ray_dir, isec, mat, isec["normal"], self.sky_gradient(refl)
            )
        return self.apply_atmosphere(state, ray_pos, ray_dir, isec, col)

    def scene_color(self, state, ray_pos, ray_dir):
        # renderer.cl:407-446
        o = self.o
        isec = {}
        self.raymarch(ray_pos, ray_dir, isec, o["maxDist"], o["maxIter"], True)
        if isec["distance"] >= o["maxDist"]:
            col = self.sky_gradient(ray_dir)
        else:
            mat = self.material(min(max(isec["objectID"], 0), 3))
            norm = isec["normal"] + state["mcNormal"] / F(mat["smoothness"] * 200.0 + 5.0)
            if mat["r0"] > 0.0 and o["reflectIter"] > 0:
                reflect_col = v3(0.0, 0.0, 0.0)
                r_isec = {"pos": isec["pos"].copy(), "normal": norm.copy()}
                r_dir = ray_dir.copy()
                for _ in range(o["reflectIter"]):
                    r_dir = r_dir - 2.0 * (r_dir @ r_isec["normal"]) * r_isec["normal"]
                    r_pos = r_isec["pos"] + r_dir * F(0.0075)
                    reflect_col = reflect_col + self.basic_scene_color(state, r_pos, r_dir, r_isec)
                    if r_isec["objectID"] < 0:
                        break
                    if self.o["mat_r0"][min(max(r_isec["objectID"], 0), 3)] < 0.001:
                        break
            else:
                refl = ray_dir - 2.0 * (ray_dir @ norm) * norm
                reflect_col = self.sky_gradient(refl)
            col = self.object_lighting(state, ray_dir, isec, mat, norm, reflect_col)
        return self.apply_atmosphere(state, ray_pos, ray_dir, isec, col)

    # --- per-pixel state / camera ------------------------------------------
    def init_render_state(self, pid):
        # renderer.cl:467-476
        o = self.o
        w = o["resolution"][0]
        p = v3(pid % w, pid // w)
        mc_pos = rand_float4(
            self.table, np.uint32(pid * 17) + np.uint32(np.int32(F(o["time"] * F(3141.3862))))
        )
        mc_normal = normalize(
            rand_float4(
                self.table, np.uint32(pid * 37) + np.uint32(np.int32(F(o["time"] * F(1859.1467))))
            )[:3]
        )
        return {
            "mcPos": mc_pos,
            "mcNormal": mc_normal,
            "pixelPos": p + mc_pos[2:4],
            "eyePos": mc_normal[[2, 0, 1]] * o["dof"] + o["eyePos"],
        }

    def camera_ray(self, state):
        # renderer.cl:456-465
        o = self.o
        forward = normalize(o["targetPos"] - state["eyePos"])
        right = normalize(np.cross(forward, o["up"]).astype(F))
        vc = state["pixelPos"] / v3(*o["resolution"]) * o["fov"] - o["fov"] * F(0.5)
        vcy = F(vc[1] * -o["invAspect"])
        d = normalize(right * vc[0] + np.cross(right, forward).astype(F) * vcy + forward)
        return state["eyePos"], d

    def render_pixel(self, pid):
        # renderer.cl:478-494 (single pass, no blend)
        state = self.init_render_state(pid)
        pos, d = self.camera_ray(state)
        return self.scene_color(state, pos, d) * self.o["exposure"]


def opts_to_dict(opts):
    """RenderOpts -> plain numpy dict for the scalar oracle."""
    d = {}
    for name in (
        "eyePos", "targetPos", "up", "voxelBounds", "voxelBounds2",
        "voxelBoundsMin", "voxelBoundsMax", "invVoxelScale", "skyColor1",
        "skyColor2", "invAspect", "time", "fov", "maxDist", "startDist",
        "eps", "aoStepDist", "aoAmp", "voxelSize", "groundY", "shadowBias",
        "lightScatter", "minLightAtt", "gamma", "exposure", "dof",
        "frameBlend", "fogPow", "flareAmp", "lightPos", "lightColor",
        "mat_albedo", "mat_r0", "mat_smoothness",
    ):
        d[name] = np.asarray(getattr(opts, name), dtype=F)
    for name in (
        "resolution", "voxelRes", "maxIter", "maxVoxelIter", "shadowIter",
        "aoIter", "reflectIter", "numLights", "isoVal", "mcTableLength",
    ):
        d[name] = getattr(opts, name)
    return d
