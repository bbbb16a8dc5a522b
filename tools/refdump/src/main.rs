//! Golden-vector dumper: runs the *reference* rust-s2 library (compiled
//! against the offline API stubs in ../stubs) and prints reference-truth
//! outputs as JSON lines. The Python engine's pytest goldens and DuckDB
//! oracles consume these dumps, giving cell-for-cell parity checks for
//! coverings, advance_wrap, Rect hausdorff, RectBounder bounds,
//! expanded_by_distance_uv and max_tile.
//!
//! Usage: cargo run --release > dump.jsonl   (each line has a "kind" tag)

use s2::cap::Cap;
use s2::cellid::CellID;
use s2::latlng::LatLng;
use s2::point::Point;
use s2::r1;
use s2::r2;
use s2::rect::Rect;
use s2::rect_bounder::RectBounder;
use s2::region::{Region, RegionCoverer};
use s2::s1::angle::{Angle, Deg, Rad};

fn tokens(cu: &s2::cellunion::CellUnion) -> String {
    let toks: Vec<String> = cu.0.iter().map(|c| format!("\"{}\"", c.to_token())).collect();
    format!("[{}]", toks.join(","))
}

fn f(x: f64) -> String {
    if x.is_infinite() {
        if x > 0.0 { "\"inf\"".to_string() } else { "\"-inf\"".to_string() }
    } else if x.is_nan() {
        "\"nan\"".to_string()
    } else {
        format!("{:?}", x) // shortest round-trip repr
    }
}

fn dump_coverings() {
    // region set: (name, kind, params...) — caps via (lat, lng, area) and
    // rects via (lat_lo, lng_lo, lat_hi, lng_hi) degrees
    let caps: Vec<(&str, f64, f64, f64)> = vec![
        ("doc_example", 47.3, 8.5, 5.0),
        ("zurich_small", 47.3, 8.5, 0.05),
        ("zurich_tiny", 47.3, 8.5, 1e-3),
        ("zurich_micro", 47.3, 8.5, 1e-6),
        ("equator_origin", 0.0, 0.0, 0.1),
        ("antimeridian", 10.0, 179.9, 0.2),
        ("north_pole", 89.9, 45.0, 0.3),
        ("south_pole", -89.99, -120.0, 0.01),
        ("face_corner", 45.0, 45.0, 0.02), // near a cube-face corner
        ("sydney", -33.86, 151.21, 0.004),
        ("hemisphere", 20.0, -60.0, 6.28),
    ];
    let rects: Vec<(&str, f64, f64, f64, f64)> = vec![
        ("nyc_box", 40.4, -74.5, 41.0, -73.5),
        ("wrap_box", -5.0, 178.0, 5.0, -178.0),
        ("polar_cap_box", 80.0, -180.0, 90.0, 180.0),
        ("thin_lat_band", -1.0, -180.0, 1.0, 180.0),
        ("europe", 35.0, -10.0, 60.0, 30.0),
        ("tiny_box", 47.299, 8.499, 47.301, 8.501),
    ];
    let params: Vec<(u8, u8, u8, usize)> = vec![
        // (min_level, max_level, level_mod, max_cells)
        (0, 30, 1, 8),
        (0, 30, 1, 4),
        (0, 30, 1, 20),
        (4, 16, 1, 8),
        (7, 30, 1, 5),
        (0, 30, 2, 8),
        (0, 30, 3, 8),
        (2, 12, 2, 12),
        (0, 10, 1, 1),
    ];
    for (min_level, max_level, level_mod, max_cells) in &params {
        let rc = RegionCoverer {
            min_level: *min_level,
            max_level: *max_level,
            level_mod: *level_mod,
            max_cells: *max_cells,
        };
        for (name, lat, lng, area) in &caps {
            let pt = Point::from(LatLng::from_degrees(*lat, *lng));
            let cap = Cap::from_center_area(&pt, *area);
            let cov = rc.covering(&cap);
            let int = rc.interior_covering(&cap);
            let fast = rc.fast_covering(&cap);
            println!(
                "{{\"kind\":\"covering\",\"region\":\"cap\",\"name\":\"{}\",\"lat\":{},\"lng\":{},\"area\":{},\"min_level\":{},\"max_level\":{},\"level_mod\":{},\"max_cells\":{},\"covering\":{},\"interior\":{},\"fast\":{}}}",
                name, f(*lat), f(*lng), f(*area), min_level, max_level, level_mod, max_cells,
                tokens(&cov), tokens(&int), tokens(&fast)
            );
        }
        for (name, lat_lo, lng_lo, lat_hi, lng_hi) in &rects {
            let rect = Rect::from_degrees(*lat_lo, *lng_lo, *lat_hi, *lng_hi);
            let cov = rc.covering(&rect);
            let int = rc.interior_covering(&rect);
            let fast = rc.fast_covering(&rect);
            println!(
                "{{\"kind\":\"covering\",\"region\":\"rect\",\"name\":\"{}\",\"lat_lo\":{},\"lng_lo\":{},\"lat_hi\":{},\"lng_hi\":{},\"min_level\":{},\"max_level\":{},\"level_mod\":{},\"max_cells\":{},\"covering\":{},\"interior\":{},\"fast\":{}}}",
                name, f(*lat_lo), f(*lng_lo), f(*lat_hi), f(*lng_hi), min_level, max_level, level_mod, max_cells,
                tokens(&cov), tokens(&int), tokens(&fast)
            );
        }
    }
}

fn dump_advance_wrap() {
    // ids: face cells, leaf cells from latlngs, mid-level cells
    let mut ids: Vec<CellID> = Vec::new();
    for face in 0..6u64 {
        ids.push(CellID::from_face(face));
    }
    let lls = [
        (49.703498679, 11.770681595),
        (-30.694551352, -30.048758753),
        (-75.000000031, 0.000000133),
        (0.0, 0.0),
        (89.9, 0.0),
    ];
    for (lat, lng) in lls {
        let leaf = CellID::from(LatLng::from_degrees(lat, lng));
        ids.push(leaf);
        ids.push(leaf.parent(10));
        ids.push(leaf.parent(3));
    }
    let steps: Vec<i64> = vec![
        0, 1, -1, 2, -2, 7, -7, 12, -12, 4096, -4096, 1 << 30, -(1 << 30),
        (1i64 << 40) + 13, -((1i64 << 40) + 13), i64::MAX / 4, -(i64::MAX / 4),
    ];
    for id in &ids {
        for s in &steps {
            let w = id.advance_wrap(*s);
            let a = id.advance(*s);
            println!(
                "{{\"kind\":\"advance\",\"id\":{},\"steps\":{},\"advance_wrap\":{},\"advance\":{}}}",
                id.0, s, w.0, a.0
            );
        }
    }
}

fn dump_max_tile() {
    let start = CellID::from(LatLng::from_degrees(40.0, -74.0)).parent(12);
    let cases: Vec<(CellID, CellID)> = vec![
        (start.child_begin(), start.child_end()),
        (start.range_min(), start.range_max()),
        (start.range_min(), CellID(start.range_max().0.wrapping_add(2))),
        (start, start.next().next()),
        (start.child_begin_at_level(20), start.next().range_min()),
    ];
    for (id, limit) in cases {
        let t = id.max_tile(&limit);
        println!(
            "{{\"kind\":\"max_tile\",\"id\":{},\"limit\":{},\"result\":{}}}",
            id.0, limit.0, t.0
        );
    }
}

fn dump_hausdorff() {
    let rects: Vec<(f64, f64, f64, f64)> = vec![
        (40.4, -74.5, 41.0, -73.5),
        (40.0, -75.0, 40.5, -74.0),
        (-5.0, 178.0, 5.0, -178.0),
        (-5.0, -178.0, 5.0, 178.0), // inverted wrap
        (80.0, -180.0, 90.0, 180.0),
        (-90.0, -180.0, -80.0, 180.0),
        (0.0, 0.0, 0.0, 0.0),
        (10.0, 20.0, 30.0, 40.0),
        (-30.0, 100.0, -10.0, 140.0),
        (35.0, -10.0, 60.0, 30.0),
        (47.0, 8.0, 48.0, 9.0),
        (46.0, -122.0, 48.0, -120.0),
    ];
    for (i, a) in rects.iter().enumerate() {
        for (j, b) in rects.iter().enumerate() {
            let ra = Rect::from_degrees(a.0, a.1, a.2, a.3);
            let rb = Rect::from_degrees(b.0, b.1, b.2, b.3);
            let d = ra.directed_hausdorff_distance(&rb);
            let h = ra.hausdorff_distance(&rb);
            println!(
                "{{\"kind\":\"hausdorff\",\"i\":{},\"j\":{},\"a\":[{},{},{},{}],\"b\":[{},{},{},{}],\"directed\":{},\"undirected\":{}}}",
                i, j, f(a.0), f(a.1), f(a.2), f(a.3), f(b.0), f(b.1), f(b.2), f(b.3),
                f(d.rad()), f(h.rad())
            );
        }
    }
}

fn dump_rect_bounder() {
    // point chains: (name, list of (lat, lng) degrees)
    let chains: Vec<(&str, Vec<(f64, f64)>)> = vec![
        ("simple", vec![(0.0, 0.0), (10.0, 10.0), (20.0, 5.0)]),
        // classic RectBounder trap: edge interior exceeds endpoint latitudes
        ("max_lat_edge", vec![(45.0, -90.0), (45.0, 90.0)]),
        ("near_max_lat", vec![(45.0, -179.0), (45.0, 179.0)]),
        ("south_edge", vec![(-45.0, 0.0), (-45.0, 179.9)]),
        ("wrap_chain", vec![(10.0, 170.0), (15.0, -175.0), (5.0, -160.0)]),
        ("pole_touch", vec![(89.0, 0.0), (89.0, 90.0), (89.0, 180.0), (89.0, -90.0)]),
        ("long_geodesic", vec![(-60.0, -120.0), (60.0, 60.0)]),
        ("two_points_antipodal_ish", vec![(30.0, 40.0), (-29.9999, -139.9999)]),
        ("dense_small", vec![(47.30, 8.50), (47.31, 8.52), (47.29, 8.54), (47.305, 8.49)]),
    ];
    for (name, pts) in &chains {
        let mut rb = RectBounder::new();
        for (lat, lng) in pts {
            rb.add_point(&Point::from(LatLng::from_degrees(*lat, *lng)));
        }
        let b = rb.get_bound();
        println!(
            "{{\"kind\":\"rect_bounder\",\"name\":\"{}\",\"points\":{:?},\"lat_lo\":{},\"lat_hi\":{},\"lng_lo\":{},\"lng_hi\":{}}}",
            name,
            pts.iter().flat_map(|(a, b)| [*a, *b]).collect::<Vec<f64>>(),
            f(b.lat.lo), f(b.lat.hi), f(b.lng.lo), f(b.lng.hi)
        );
    }
}

/// Local replica of the reference's test-gated expanded_by_distance_uv
/// (cellid.rs:691-740) — it is #[cfg(test)] there, so unreachable from a
/// lib build; the formula is reproduced verbatim to generate goldens.
fn expand_endpoint(u: f64, max_v: f64, sin_dist: f64) -> f64 {
    let sin_u_shift = sin_dist * ((1. + u * u + max_v * max_v) / (1. + u * u)).sqrt();
    let cos_u_shift = (1. - sin_u_shift * sin_u_shift).sqrt();
    (cos_u_shift * u + sin_u_shift) / (cos_u_shift - sin_u_shift * u)
}

fn expanded_by_distance_uv(uv: &r2::rect::Rect, distance: &Angle) -> r2::rect::Rect {
    let max_u = uv.x.lo.abs().max(uv.x.hi.abs());
    let max_v = uv.y.lo.abs().max(uv.y.hi.abs());
    let sin_dist = distance.rad().sin();
    r2::rect::Rect {
        x: r1::interval::Interval::new(
            expand_endpoint(uv.x.lo, max_v, -sin_dist),
            expand_endpoint(uv.x.hi, max_v, sin_dist),
        ),
        y: r1::interval::Interval::new(
            expand_endpoint(uv.y.lo, max_u, -sin_dist),
            expand_endpoint(uv.y.hi, max_u, sin_dist),
        ),
    }
}

fn dump_expanded_by_distance_uv() {
    let uv_rects: Vec<(f64, f64, f64, f64)> = vec![
        (-0.2, 0.3, -0.1, 0.4),
        (0.0, 1.0, 0.0, 1.0),
        (-1.0, 1.0, -1.0, 1.0),
        (0.5, 0.6, -0.3, -0.2),
        (-0.01, 0.01, -0.01, 0.01),
    ];
    let dists: Vec<f64> = vec![0.0, 1e-6, 0.01, 0.1, 0.5, -0.01, -0.1];
    for (ulo, uhi, vlo, vhi) in &uv_rects {
        for d in &dists {
            let rect = r2::rect::Rect {
                x: r1::interval::Interval { lo: *ulo, hi: *uhi },
                y: r1::interval::Interval { lo: *vlo, hi: *vhi },
            };
            let ang = Angle::from(Rad(*d));
            let e = expanded_by_distance_uv(&rect, &ang);
            println!(
                "{{\"kind\":\"expanded_uv\",\"u_lo\":{},\"u_hi\":{},\"v_lo\":{},\"v_hi\":{},\"dist\":{},\"out\":[{},{},{},{}]}}",
                f(*ulo), f(*uhi), f(*vlo), f(*vhi), f(*d),
                f(e.x.lo), f(e.x.hi), f(e.y.lo), f(e.y.hi)
            );
        }
    }
}

fn dump_edge_distances() {
    use s2::edgeutil::{distance_from_segment, interpolate, interpolate_at_distance};
    let segs: Vec<((f64, f64), (f64, f64))> = vec![
        ((0.0, 0.0), (0.0, 10.0)),
        ((45.0, -90.0), (45.0, 90.0)),
        ((-30.0, 170.0), (-35.0, -170.0)),
        ((89.0, 0.0), (89.0, 180.0)),
        ((10.0, 10.0), (10.000001, 10.000001)),
    ];
    let pts: Vec<(f64, f64)> = vec![
        (0.0, 5.0), (5.0, 5.0), (-5.0, 5.0), (0.0, 15.0), (90.0, 0.0),
        (-90.0, 0.0), (46.0, 0.0), (44.0, 0.0), (-32.0, 180.0), (88.0, 90.0),
    ];
    for (i, ((alat, alng), (blat, blng))) in segs.iter().enumerate() {
        let a = Point::from(LatLng::from_degrees(*alat, *alng));
        let b = Point::from(LatLng::from_degrees(*blat, *blng));
        for (j, (plat, plng)) in pts.iter().enumerate() {
            let x = Point::from(LatLng::from_degrees(*plat, *plng));
            let d = distance_from_segment(&x, &a, &b);
            println!(
                "{{\"kind\":\"seg_dist\",\"seg\":{},\"pt\":{},\"a\":[{},{}],\"b\":[{},{}],\"x\":[{},{}],\"dist\":{}}}",
                i, j, f(*alat), f(*alng), f(*blat), f(*blng), f(*plat), f(*plng), f(d.rad())
            );
        }
        for t in [0.0, 0.25, 0.5, 0.75, 1.0, 1.5, -0.5] {
            let p = interpolate(t, &a, &b);
            let ll = LatLng::from(p);
            println!(
                "{{\"kind\":\"interpolate\",\"seg\":{},\"t\":{},\"lat\":{},\"lng\":{}}}",
                i, f(t), f(ll.lat.deg()), f(ll.lng.deg())
            );
        }
        for dr in [0.0, 0.001, 0.01, 0.1] {
            let p = interpolate_at_distance(&Angle::from(Rad(dr)), &a, &b);
            let ll = LatLng::from(p);
            println!(
                "{{\"kind\":\"interpolate_at_distance\",\"seg\":{},\"d\":{},\"lat\":{},\"lng\":{}}}",
                i, f(dr), f(ll.lat.deg()), f(ll.lng.deg())
            );
        }
    }
}

fn dump_neighbors() {
    let lls = [
        (49.703498679, 11.770681595),
        (-30.694551352, -30.048758753),
        (0.0, 0.0),
        (89.9, 0.0),
        (-89.9, 123.0),
        (45.0, 45.0), // face corner area
        (10.050986518, 78.293170610),
        (-75.000000031, 0.000000133),
    ];
    let mut ids: Vec<CellID> = Vec::new();
    for face in 0..6u64 {
        ids.push(CellID::from_face(face));
    }
    for (lat, lng) in lls {
        let leaf = CellID::from(LatLng::from_degrees(lat, lng));
        for lvl in [1u64, 5, 12, 20, 30] {
            ids.push(leaf.parent(lvl));
        }
    }
    for id in &ids {
        let en: Vec<String> = id.edge_neighbors().iter().map(|c| c.0.to_string()).collect();
        println!(
            "{{\"kind\":\"edge_neighbors\",\"id\":{},\"out\":[{}]}}",
            id.0,
            en.join(",")
        );
        let lvl = id.level();
        for nl in [lvl, lvl + 1, lvl.saturating_sub(1).max(0)] {
            if nl >= lvl.saturating_sub(1) && nl <= 30 && nl >= 1 {
                let vn: Vec<String> = id.vertex_neighbors(nl).iter().map(|c| c.0.to_string()).collect();
                println!(
                    "{{\"kind\":\"vertex_neighbors\",\"id\":{},\"level\":{},\"out\":[{}]}}",
                    id.0, nl, vn.join(",")
                );
            }
            if nl >= lvl && nl <= 30 {
                let an: Vec<String> = id.all_neighbors(nl).iter().map(|c| c.0.to_string()).collect();
                println!(
                    "{{\"kind\":\"all_neighbors\",\"id\":{},\"level\":{},\"out\":[{}]}}",
                    id.0, nl, an.join(",")
                );
            }
        }
    }
}

fn dump_cellunion_ops() {
    use s2::cellunion::CellUnion;
    // two overlapping cap coverings at a few parameter combos
    let rc = RegionCoverer { min_level: 0, max_level: 30, level_mod: 1, max_cells: 12 };
    let regions = [
        (47.3, 8.5, 0.05, 47.6, 9.0, 0.08),
        (0.0, 0.0, 0.1, 0.5, 0.5, 0.1),
        (10.0, 179.9, 0.2, 10.0, -179.5, 0.15),
        (89.9, 45.0, 0.3, -89.9, 45.0, 0.3),
        (40.7, -74.0, 0.01, 40.75, -73.95, 0.02),
    ];
    for (i, (lat1, lng1, a1, lat2, lng2, a2)) in regions.iter().enumerate() {
        let c1 = Cap::from_center_area(&Point::from(LatLng::from_degrees(*lat1, *lng1)), *a1);
        let c2 = Cap::from_center_area(&Point::from(LatLng::from_degrees(*lat2, *lng2)), *a2);
        let u1 = rc.covering(&c1);
        let u2 = rc.covering(&c2);
        let un = CellUnion::union(&u1, &u2);
        let ix = CellUnion::intersection(&u1, &u2);
        let df = CellUnion::difference(&u1, &u2);
        println!(
            "{{\"kind\":\"cellunion_ops\",\"case\":{},\"a\":{},\"b\":{},\"union\":{},\"intersection\":{},\"difference\":{}}}",
            i, tokens(&u1), tokens(&u2), tokens(&un), tokens(&ix), tokens(&df)
        );
    }
}

fn dump_from_range() {
    use s2::cellunion::CellUnion;
    let anchor = CellID::from(LatLng::from_degrees(40.0, -74.0));
    let cases: Vec<(CellID, CellID)> = vec![
        (anchor.parent(12).range_min(), anchor.parent(12).range_max()),
        (anchor.parent(10).range_min(), CellID(anchor.parent(10).range_max().0.wrapping_add(2))),
        (anchor.parent(8).range_min(), anchor.parent(4).range_max()),
        (CellID::from_face(0).range_min(), CellID::from_face(2).range_max()),
        (anchor.parent(20).range_min(), anchor.parent(6).child_end().range_min()),
    ];
    for (i, (b, e)) in cases.iter().enumerate() {
        let cu = CellUnion::from_range(*b, *e);
        println!(
            "{{\"kind\":\"from_range\",\"case\":{},\"begin\":{},\"end\":{},\"out\":{}}}",
            i, b.0, e.0, tokens(&cu)
        );
    }
}

fn dump_cell_areas() {
    use s2::cell::Cell;
    let lls = [
        (49.703498679, 11.770681595),
        (-30.694551352, -30.048758753),
        (0.0, 0.0),
        (89.9, 0.0),
        (45.0, 45.0),
        (-75.000000031, 0.000000133),
        (10.050986518, 78.293170610),
    ];
    let mut ids: Vec<CellID> = (0..6u64).map(CellID::from_face).collect();
    for (lat, lng) in lls {
        let leaf = CellID::from(LatLng::from_degrees(lat, lng));
        for lvl in [1u64, 3, 7, 12, 18, 25, 30] {
            ids.push(leaf.parent(lvl));
        }
    }
    for id in &ids {
        let c = Cell::from(id);
        println!(
            "{{\"kind\":\"cell_area\",\"id\":{},\"exact\":{},\"approx\":{},\"average\":{}}}",
            id.0,
            f(c.exact_area()),
            f(c.approx_area()),
            f(c.average_area())
        );
    }
}

fn dump_region_predicates() {
    use s2::cell::Cell;
    use s2::region::Region as _;
    // caps and rects from the covering fixture set; cells = each
    // region's own covering cells plus parents/children/shifted ids
    let caps: Vec<(f64, f64, f64)> = vec![
        (47.3, 8.5, 0.05),
        (0.0, 0.0, 0.1),
        (10.0, 179.9, 0.2),
        (89.9, 45.0, 0.3),
        (-33.86, 151.21, 0.004),
    ];
    let rects: Vec<(f64, f64, f64, f64)> = vec![
        (40.4, -74.5, 41.0, -73.5),
        (-5.0, 178.0, 5.0, -178.0),
        (80.0, -180.0, 90.0, 180.0),
        (35.0, -10.0, 60.0, 30.0),
    ];
    let rc = RegionCoverer { min_level: 0, max_level: 30, level_mod: 1, max_cells: 8 };
    let mut emit = |kind: &str, ridx: usize, cells: Vec<CellID>,
                    cp: &dyn Fn(&Cell) -> bool, ic: &dyn Fn(&Cell) -> bool| {
        for id in cells {
            let cell = Cell::from(&id);
            println!(
                "{{\"kind\":\"region_pred\",\"region\":\"{}\",\"ridx\":{},\"cell\":{},\"contains_cell\":{},\"intersects_cell\":{}}}",
                kind, ridx, id.0, cp(&cell), ic(&cell)
            );
        }
    };
    let variants = |cov: &s2::cellunion::CellUnion| -> Vec<CellID> {
        let mut out = Vec::new();
        for id in cov.0.iter().take(6) {
            out.push(*id);
            if id.level() >= 1 {
                out.push(id.parent(id.level() - 1));
                out.push(id.child_begin());
            }
            out.push(id.next_wrap());
            out.push(id.next_wrap().next_wrap());
        }
        for face in 0..6u64 {
            out.push(CellID::from_face(face));
        }
        out
    };
    for (i, (lat, lng, area)) in caps.iter().enumerate() {
        let cap = Cap::from_center_area(&Point::from(LatLng::from_degrees(*lat, *lng)), *area);
        let cov = rc.covering(&cap);
        let c1 = cap.clone();
        let c2 = cap.clone();
        emit("cap", i, variants(&cov), &move |c| c1.contains_cell(c), &move |c| {
            c2.intersects_cell(c)
        });
    }
    for (i, r) in rects.iter().enumerate() {
        let rect = Rect::from_degrees(r.0, r.1, r.2, r.3);
        let cov = rc.covering(&rect);
        let r1c = rect.clone();
        let r2c = rect.clone();
        emit("rect", i, variants(&cov), &move |c| r1c.contains_cell(c), &move |c| {
            r2c.intersects_cell(c)
        });
    }
}

fn dump_extra_region_coverings() {
    use s2::cell::Cell;
    use s2::cellunion::CellUnion;
    let params: Vec<(u8, u8, u8, usize)> = vec![
        (0, 30, 1, 8),
        (0, 30, 1, 4),
        (4, 16, 1, 8),
        (0, 30, 2, 8),
    ];
    let lls = [
        (49.703498679, 11.770681595),
        (0.0, 0.0),
        (89.9, 45.0),
        (-33.86, 151.21),
    ];
    for (min_level, max_level, level_mod, max_cells) in &params {
        let rc = RegionCoverer {
            min_level: *min_level,
            max_level: *max_level,
            level_mod: *level_mod,
            max_cells: *max_cells,
        };
        // Cell regions at several levels
        for (lat, lng) in lls {
            for lvl in [2u64, 8, 14] {
                let id = CellID::from(LatLng::from_degrees(lat, lng)).parent(lvl);
                let cell = Cell::from(&id);
                println!(
                    "{{\"kind\":\"covering2\",\"region\":\"cell\",\"id\":{},\"min_level\":{},\"max_level\":{},\"level_mod\":{},\"max_cells\":{},\"covering\":{},\"interior\":{},\"fast\":{}}}",
                    id.0, min_level, max_level, level_mod, max_cells,
                    tokens(&rc.covering(&cell)), tokens(&rc.interior_covering(&cell)), tokens(&rc.fast_covering(&cell))
                );
            }
        }
        // Point regions
        for (lat, lng) in lls {
            let p = Point::from(LatLng::from_degrees(lat, lng));
            println!(
                "{{\"kind\":\"covering2\",\"region\":\"point\",\"lat\":{},\"lng\":{},\"min_level\":{},\"max_level\":{},\"level_mod\":{},\"max_cells\":{},\"covering\":{},\"interior\":{},\"fast\":{}}}",
                f(lat), f(lng), min_level, max_level, level_mod, max_cells,
                tokens(&rc.covering(&p)), tokens(&rc.interior_covering(&p)), tokens(&rc.fast_covering(&p))
            );
        }
        // CellUnion regions (covering of a cap reused as the region)
        for (i, (lat, lng)) in lls.iter().enumerate() {
            let cap = Cap::from_center_area(&Point::from(LatLng::from_degrees(*lat, *lng)), 0.02);
            let base = RegionCoverer { min_level: 0, max_level: 30, level_mod: 1, max_cells: 12 };
            let cu: CellUnion = base.covering(&cap);
            println!(
                "{{\"kind\":\"covering2\",\"region\":\"cellunion\",\"case\":{},\"input\":{},\"min_level\":{},\"max_level\":{},\"level_mod\":{},\"max_cells\":{},\"covering\":{},\"interior\":{},\"fast\":{}}}",
                i, tokens(&cu), min_level, max_level, level_mod, max_cells,
                tokens(&rc.covering(&cu)), tokens(&rc.interior_covering(&cu)), tokens(&rc.fast_covering(&cu))
            );
        }
    }
}

fn dump_angle_encodings() {
    // reference semantics: s1/angle.rs convert_i32! macro —
    // E{k} = round(deg * 1e{k}) as i32 (f64::round = half away from zero);
    // back: Deg = e / 1e{k}, Angle(rad) = e * (PI/180/1e{k}).
    use s2::s1::angle::{E5, E6, E7};
    let degs: Vec<f64> = vec![
        0.0, -0.0, 1.0, -1.0, 180.0, -180.0, 90.0, -90.0,
        47.3, 8.5, 40.7128, -74.0060, -33.8688, 151.2093,
        1e-9, -1e-9, 1e-5, -1e-5, 0.000005, -0.000005, 0.000015, -0.000015,
        0.0000005, -0.0000005, 0.00000005, -0.00000005,
        12.3456789, -12.3456789, 89.99999995, -89.99999995,
        179.99999999, -179.99999999, 0.1, 0.2, 0.3, 1.0 / 3.0, 2.0 / 3.0,
    ];
    for (i, d) in degs.iter().enumerate() {
        let deg = Deg(*d);
        let e5 = E5::from(deg.clone());
        let e6 = E6::from(deg.clone());
        let e7 = E7::from(deg.clone());
        let back5 = Deg::from(e5.clone());
        let back6 = Deg::from(e6.clone());
        let back7 = Deg::from(e7.clone());
        let rad7: Angle = e7.clone().into();
        println!(
            "{{\"kind\":\"angle_encoding\",\"case\":{},\"deg\":{},\"e5\":{},\"e6\":{},\"e7\":{},\"deg_from_e5\":{},\"deg_from_e6\":{},\"deg_from_e7\":{},\"rad_from_e7\":{}}}",
            i, f(*d), e5.0, e6.0, e7.0, f(back5.0), f(back6.0), f(back7.0), f(rad7.rad())
        );
    }
}

fn dump_api_extras() {
    // Cap.interior_intersects / from_center_chordangle parity
    let params: Vec<(f64, f64, f64)> = vec![
        (0.0, 0.0, 0.5), (0.0, 0.0, 2.0), (1.0, 1.0, 0.5), (10.0, 10.0, 1.0),
        (0.0, 180.0, 2.0), (90.0, 0.0, 0.3), (-90.0, 0.0, 0.3), (47.3, 8.5, 5.0),
        (0.0, 0.1, 1e-12), (0.0, 0.0, 12.56), (45.0, 45.0, 3.0), (-45.0, 135.0, 0.05),
    ];
    let caps: Vec<Cap> = params
        .iter()
        .map(|(la, ln, ar)| Cap::from_center_area(&Point::from(LatLng::from_degrees(*la, *ln)), *ar))
        .collect();
    for (i, a) in caps.iter().enumerate() {
        for (j, b) in caps.iter().enumerate() {
            println!(
                "{{\"kind\":\"cap_pair\",\"i\":{},\"j\":{},\"contains\":{},\"intersects\":{},\"interior_intersects\":{}}}",
                i, j, a.contains(b), a.intersects(b), a.interior_intersects(b)
            );
        }
    }
    // Rect approx_eq + interior_contains family
    let rects: Vec<Rect> = vec![
        Rect::from_degrees(10.0, 20.0, 30.0, 40.0),
        Rect::from_degrees(10.0, 20.0, 30.0, 40.0),
        Rect::from_degrees(10.000000000000002, 20.0, 30.0, 40.0),
        Rect::from_degrees(10.1, 20.0, 30.0, 40.0),
        Rect::from_degrees(15.0, 25.0, 25.0, 35.0),
        Rect::from_degrees(10.0, 170.0, 30.0, -170.0),
        Rect::from_degrees(12.0, 175.0, 28.0, -175.0),
        Rect::empty(),
        Rect::full(),
        Rect::from_degrees(-90.0, -180.0, 90.0, 180.0),
    ];
    let lls: Vec<(f64, f64)> = vec![
        (10.0, 20.0), (20.0, 30.0), (10.000001, 30.0), (29.999999, 39.999999),
        (0.0, 0.0), (20.0, 180.0), (20.0, -178.0),
    ];
    for (i, a) in rects.iter().enumerate() {
        for (j, b) in rects.iter().enumerate() {
            println!(
                "{{\"kind\":\"rect_pair\",\"i\":{},\"j\":{},\"approx_eq\":{},\"contains\":{},\"interior_contains\":{}}}",
                i, j, a.approx_eq(b), a.contains(b), a.interior_contains(b)
            );
        }
        for (m, (la, ln)) in lls.iter().enumerate() {
            let ll = LatLng::from_degrees(*la, *ln);
            println!(
                "{{\"kind\":\"rect_ll\",\"i\":{},\"m\":{},\"contains_ll\":{},\"interior_contains_ll\":{}}}",
                i, m, a.contains_latlng(&ll), a.interior_contains_latlng(&ll)
            );
        }
    }
    // CellID from_face_pos_level / raw_point / child_iter
    let fpl_cases: Vec<(u64, u64, u64)> = vec![
        (3, 0x12345678, 26), (0, 0, 0), (5, 0, 30), (2, 0x0fedcba987654321, 15),
        (4, 0x1fffffffffffffff, 30), (1, 0x123456789abcdef0 >> 3, 7), (0, 1, 1),
    ];
    for (i, (fc, p, l)) in fpl_cases.iter().enumerate() {
        let id = CellID::from_face_pos_level(*fc, *p, *l);
        let rp = id.raw_point();
        println!(
            "{{\"kind\":\"fpl\",\"case\":{},\"face\":{},\"pos\":{},\"level\":{},\"id\":{},\"raw_x\":{},\"raw_y\":{},\"raw_z\":{}}}",
            i, fc, p, l, id.0, f(rp.x), f(rp.y), f(rp.z)
        );
    }
    let iter_cells: Vec<CellID> = vec![
        CellID::from_face_pos_level(3, 0x12345678, 27),
        CellID::from(LatLng::from_degrees(40.7128, -74.0060)).parent(28),
    ];
    for (i, c) in iter_cells.iter().enumerate() {
        let kids: Vec<String> = c.child_iter().map(|x| format!("{}", x.0)).collect();
        let kids2: Vec<String> = c.child_iter_at_level(c.level() + 2).map(|x| format!("{}", x.0)).collect();
        println!(
            "{{\"kind\":\"child_iter\",\"case\":{},\"id\":{},\"children\":[{}],\"grandchildren\":[{}]}}",
            i, c.0, kids.join(","), kids2.join(",")
        );
    }
}

fn main() {
    let _ = Deg(0.0); // keep import used
    dump_coverings();
    dump_extra_region_coverings();
    dump_neighbors();
    dump_cellunion_ops();
    dump_from_range();
    dump_cell_areas();
    dump_region_predicates();
    dump_advance_wrap();
    dump_max_tile();
    dump_hausdorff();
    dump_rect_bounder();
    dump_expanded_by_distance_uv();
    dump_edge_distances();
    dump_angle_encodings();
    dump_api_extras();
}
